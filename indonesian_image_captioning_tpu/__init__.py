"""Indonesian image captioning, TPU-native.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference (rayandrew/indonesian-image-captioning): Semantic
Compositional Networks (SCN) + Show-Attend-Tell soft attention for Indonesian
image captioning, with a ResNet-152 image encoder, a 1000-concept image
tagger, three caption decoders (pure_scn, pure_attention, attention_scn),
HDF5 preprocessing, fixed-shape batched beam-search inference, and BLEU/ROUGE
evaluation.

Not a port: the compute path is designed TPU-first — fused gate matmuls for
the SCN cell, `lax.scan` teacher forcing with validity masks, `lax.while_loop`
beam search with static shapes, `jax.sharding.Mesh` data/model parallelism,
and Pallas kernels for the decode hot loop.
"""

__version__ = "0.1.0"
