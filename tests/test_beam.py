"""Beam engine parity vs an oracle of the reference algorithm.

The oracle transcribes the reference control flow (models/decoders/
pure_scn.py:142-249: expanding beams, flat top-k, retiring <end> beams with
shrinking k, step cap 51, best-complete selection) in plain NumPy over an
arbitrary step function.  The engine must produce the SAME best sequence and
score ("bit-for-beam") for a toy recurrent decoder with random weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indonesian_image_captioning_tpu.decode.beam import beam_search

D = 8  # toy decoder state dim


def make_toy(rng, V):
    emb = rng.normal(size=(V, D)).astype(np.float32)
    W = rng.normal(size=(D, V)).astype(np.float32) * 1.5
    h0 = rng.normal(size=(D,)).astype(np.float32)
    return emb, W, h0


def np_step(emb, W, h, prev):
    """h' = tanh(0.7 h + emb[prev]); logprobs = log_softmax(h' @ W)."""
    h2 = np.tanh(0.7 * h + emb[prev])
    logits = h2 @ W
    logits = logits - logits.max(-1, keepdims=True)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return lp, h2


def oracle_beam(emb, W, h0, k, V, start, end, max_steps=51):
    """Reference algorithm semantics, incl. its integer-division and
    shrinking-beam behaviour; returns (best_seq, best_score) with the
    crash-free fallback to the best live beam if nothing completed."""
    seqs = np.full((k, 1), start, np.int64)
    top_scores = np.zeros((k, 1), np.float64)
    h = np.tile(h0, (k, 1))
    prev = np.full(k, start, np.int64)
    complete, complete_scores = [], []
    step = 1
    while True:
        lp, h = np_step(emb, W, h, prev)
        scores = top_scores + lp  # (s, V)
        if step == 1:
            flat = scores[0]
            top_idx = np.argsort(-flat, kind="stable")[:k]
            top_vals = flat[top_idx]
            prev_inds = np.zeros(k, np.int64)
            next_inds = top_idx
        else:
            flat = scores.reshape(-1)
            top_idx = np.argsort(-flat, kind="stable")[:k]
            top_vals = flat[top_idx]
            prev_inds = top_idx // V
            next_inds = top_idx % V
        seqs = np.concatenate([seqs[prev_inds], next_inds[:, None]], axis=1)
        incomplete = [i for i, w in enumerate(next_inds) if w != end]
        completed = [i for i in range(len(next_inds)) if i not in incomplete]
        for i in completed:
            complete.append(seqs[i].tolist())
            complete_scores.append(float(top_vals[i]))
        k -= len(completed)
        if k == 0:
            break
        seqs = seqs[incomplete]
        h = h[prev_inds[incomplete]]
        top_scores = top_vals[incomplete][:, None]
        prev = next_inds[incomplete]
        if step >= max_steps:  # reference: break if step > 50 -> 51 steps max
            break
        step += 1
    if complete_scores:
        i = int(np.argmax(complete_scores))
        return complete[i], complete_scores[i]
    i = int(np.argmax(top_scores[:, 0]))
    return seqs[i].tolist(), float(top_scores[i, 0])


def engine_beam(emb, W, h0, k, V, start, end, B=1, max_steps=51):
    jemb, jW = jnp.array(emb), jnp.array(W)

    def step_fn(state, prev_words):
        h2 = jnp.tanh(0.7 * state["h"] + jemb[prev_words])
        lp = jax.nn.log_softmax(h2 @ jW, axis=-1)
        return lp, {"h": h2}, {}

    init_state = {"h": jnp.tile(jnp.array(h0), (B, k, 1))}
    return beam_search(step_fn, init_state, batch_size=B, beam_size=k,
                       vocab_size=V, start_id=start, end_id=end,
                       max_steps=max_steps, seq_len=max_steps + 1)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("k", [1, 3, 5])
def test_engine_matches_reference_algorithm(seed, k):
    rng = np.random.default_rng(seed)
    V = 13
    start, end = V - 2, V - 1
    emb, W, h0 = make_toy(rng, V)
    ref_seq, ref_score = oracle_beam(emb, W, h0, k, V, start, end)
    out = engine_beam(emb, W, h0, k, V, start, end)
    got_len = int(out["lengths"][0])
    got_seq = np.asarray(out["sequences"][0][:got_len]).tolist()
    assert got_seq == ref_seq, f"seq mismatch: {got_seq} vs {ref_seq}"
    np.testing.assert_allclose(float(out["scores"][0]), ref_score,
                               rtol=1e-4, atol=1e-4)


def test_batched_matches_individual():
    """Batched decode must equal B independent single-image decodes."""
    rng = np.random.default_rng(42)
    V, k, B = 11, 4, 3
    start, end = V - 2, V - 1
    emb, W, _ = make_toy(rng, V)
    h0s = rng.normal(size=(B, D)).astype(np.float32)

    jemb, jW = jnp.array(emb), jnp.array(W)

    def step_fn(state, prev_words):
        h2 = jnp.tanh(0.7 * state["h"] + jemb[prev_words])
        return jax.nn.log_softmax(h2 @ jW, axis=-1), {"h": h2}, {}

    batched = beam_search(
        step_fn, {"h": jnp.tile(jnp.array(h0s)[:, None], (1, k, 1))},
        batch_size=B, beam_size=k, vocab_size=V, start_id=start, end_id=end)

    for b in range(B):
        solo = beam_search(
            step_fn, {"h": jnp.tile(jnp.array(h0s[b])[None, None], (1, k, 1))},
            batch_size=1, beam_size=k, vocab_size=V, start_id=start,
            end_id=end)
        nb, ns = int(batched["lengths"][b]), int(solo["lengths"][0])
        assert nb == ns
        assert (np.asarray(batched["sequences"][b][:nb])
                == np.asarray(solo["sequences"][0][:ns])).all()


def test_emission_recording():
    """Per-step emissions follow lane reordering and land per position."""
    rng = np.random.default_rng(7)
    V, k = 9, 3
    start, end = V - 2, V - 1
    emb, W, h0 = make_toy(rng, V)
    jemb, jW = jnp.array(emb), jnp.array(W)

    def step_fn(state, prev_words):
        h2 = jnp.tanh(0.7 * state["h"] + jemb[prev_words])
        # emit the prev word id so recorded emissions are checkable
        return (jax.nn.log_softmax(h2 @ jW, axis=-1), {"h": h2},
                {"tag": prev_words[..., None].astype(jnp.float32)})

    out = beam_search(step_fn, {"h": jnp.tile(jnp.array(h0), (1, k, 1))},
                      batch_size=1, beam_size=k, vocab_size=V,
                      start_id=start, end_id=end,
                      emit_specs={"tag": (1,)})
    n = int(out["lengths"][0])
    seq = np.asarray(out["sequences"][0][:n])
    tag = np.asarray(out["tag"][0][:n, 0])
    # emission at position t was produced with prev word = seq[t-1]
    np.testing.assert_array_equal(tag[1:], seq[:-1].astype(np.float32))


def test_mixed_finish_times_and_step_cap():
    """One batch row completes immediately, one never: the early row's
    state must stay frozen while the other runs to the step cap."""
    V, k = 8, 3
    start, end = V - 2, V - 1

    def step_fn(state, prev_words):
        # row 0 always prefers <end>; row 1 never emits it
        lp = jnp.full(prev_words.shape + (V,), -10.0)
        lp = lp.at[0, :, end].set(-0.1)
        lp = lp.at[0, :, 0].set(-5.0)
        lp = lp.at[1, :, 1].set(-0.1)
        lp = lp.at[1, :, end].set(-50.0)
        return jax.nn.log_softmax(lp, -1), state, {}

    out = beam_search(step_fn, {"h": jnp.zeros((2, k, 4))}, batch_size=2,
                      beam_size=k, vocab_size=V, start_id=start, end_id=end,
                      max_steps=11, seq_len=12)
    # row 0: completed at step 1 (<start>, <end>)
    assert int(out["lengths"][0]) == 2
    assert int(out["completed_count"][0]) >= 1
    assert int(out["sequences"][0][1]) == end
    # row 1: never completed -> fallback live beam at the cap
    assert int(out["completed_count"][1]) == 0
    assert int(out["lengths"][1]) == 12
    assert (np.asarray(out["sequences"][1][1:]) == 1).all()
