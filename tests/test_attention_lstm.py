"""Attention vs a NumPy oracle; LSTM cell vs torch.nn.LSTMCell."""

import jax
import jax.numpy as jnp
import numpy as np

from indonesian_image_captioning_tpu.models import attention as attn
from indonesian_image_captioning_tpu.models import lstm_cell


def test_attention_matches_oracle(rng):
    """Oracle of reference models/attention.py:26-44 in plain numpy."""
    B, P, E, D, A = 3, 7, 12, 10, 8
    params = attn.init_attention(jax.random.key(0), E, D, A)
    enc = rng.normal(size=(B, P, E)).astype(np.float32)
    h = rng.normal(size=(B, D)).astype(np.float32)

    enc_att = attn.precompute(params, jnp.array(enc))
    awe, alpha = attn.attend(params, jnp.array(enc), enc_att, jnp.array(h))

    we, be = np.asarray(params["encoder_att"]["w"]), np.asarray(params["encoder_att"]["b"])
    wd, bd = np.asarray(params["decoder_att"]["w"]), np.asarray(params["decoder_att"]["b"])
    wf, bf = np.asarray(params["full_att"]["w"]), np.asarray(params["full_att"]["b"])

    att1 = enc @ we + be                              # (B, P, A)
    att2 = h @ wd + bd                                # (B, A)
    e = np.maximum(att1 + att2[:, None, :], 0.0) @ wf + bf  # (B, P, 1)
    e = e[..., 0]
    a_ref = np.exp(e - e.max(-1, keepdims=True))
    a_ref = a_ref / a_ref.sum(-1, keepdims=True)
    awe_ref = (enc * a_ref[..., None]).sum(1)

    np.testing.assert_allclose(np.asarray(alpha), a_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(awe), awe_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha).sum(-1), 1.0, rtol=1e-5)


def test_lstm_cell_matches_torch(rng):
    import torch

    In, H, B = 14, 9, 4
    cell = torch.nn.LSTMCell(In, H, bias=True)
    params = lstm_cell.from_torch_layout(
        cell.weight_ih.detach().numpy(), cell.weight_hh.detach().numpy(),
        cell.bias_ih.detach().numpy(), cell.bias_hh.detach().numpy())

    x = rng.normal(size=(B, In)).astype(np.float32)
    h = rng.normal(size=(B, H)).astype(np.float32)
    c = rng.normal(size=(B, H)).astype(np.float32)

    with torch.no_grad():
        h_t, c_t = cell(torch.tensor(x), (torch.tensor(h), torch.tensor(c)))
    h_j, c_j = lstm_step = lstm_cell.lstm_step(
        params, jnp.array(x), jnp.array(h), jnp.array(c))
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), rtol=1e-5, atol=1e-6)


def test_lstm_roundtrip(rng):
    params = lstm_cell.init_lstm_cell(jax.random.key(3), 6, 5)
    back = lstm_cell.from_torch_layout(**{
        k: np.asarray(v) for k, v in lstm_cell.to_torch_layout(params).items()})
    for k in params:
        np.testing.assert_allclose(np.asarray(back[k]), np.asarray(params[k]))
