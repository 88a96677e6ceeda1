"""CRF parity tests.

torchcrf is not installed, so the tests carry a compact torch reference
implementing torchcrf's documented semantics (forward-algorithm likelihood
with masked steps, end transitions at the last unmasked position, masked
Viterbi) and check the JAX scan implementation against it at fp32, plus
brute-force enumeration on tiny cases.
"""

import itertools

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from icka_tpu.nn.crf import (
    crf_decode,
    crf_decode_parallel,
    crf_log_likelihood,
    crf_marginals,
    CRF,
)


def torch_crf_llh(em, tags, mask, start, end, trans, reduction):
    """Reference CRF nll (torchcrf semantics), batch_first."""
    em, start, end, trans = map(torch.as_tensor, (em, start, end, trans))
    tags = torch.as_tensor(tags, dtype=torch.long)
    mask = torch.as_tensor(mask, dtype=torch.bool)
    B, L, T = em.shape
    # numerator
    score = start[tags[:, 0]] + em[torch.arange(B), 0, tags[:, 0]]
    prev = tags[:, 0]
    for i in range(1, L):
        m = mask[:, i]
        s = trans[prev, tags[:, i]] + em[torch.arange(B), i, tags[:, i]]
        score = score + s * m
        prev = torch.where(m, tags[:, i], prev)
    score = score + end[prev]
    # denominator
    alpha = start.unsqueeze(0) + em[:, 0]
    for i in range(1, L):
        nxt = torch.logsumexp(
            alpha.unsqueeze(2) + trans.unsqueeze(0) + em[:, i].unsqueeze(1), 1)
        alpha = torch.where(mask[:, i].unsqueeze(1), nxt, alpha)
    den = torch.logsumexp(alpha + end.unsqueeze(0), 1)
    llh = score - den
    if reduction == "none":
        return llh
    if reduction == "sum":
        return llh.sum()
    if reduction == "mean":
        return llh.mean()
    return llh.sum() / mask.float().sum()


def torch_crf_decode(em, mask, start, end, trans):
    """Reference masked Viterbi, returns ragged list per sample."""
    em, start, end, trans = map(torch.as_tensor, (em, start, end, trans))
    mask = torch.as_tensor(mask, dtype=torch.bool)
    B, L, T = em.shape
    out = []
    for b in range(B):
        n = int(mask[b].sum())
        score = start + em[b, 0]
        history = []
        for i in range(1, n):
            cand = score.unsqueeze(1) + trans + em[b, i].unsqueeze(0)
            best, idx = cand.max(0)
            history.append(idx)
            score = best
        score = score + end
        tag = int(score.argmax())
        tags = [tag]
        for idx in reversed(history):
            tag = int(idx[tag])
            tags.append(tag)
        out.append(list(reversed(tags)))
    return out


def rand_case(rng, B=4, L=9, T=6, full_mask=False):
    em = rng.standard_normal((B, L, T)).astype(np.float32)
    tags = rng.integers(0, T, (B, L)).astype(np.int32)
    if full_mask:
        mask = np.ones((B, L), np.int32)
    else:
        lens = rng.integers(1, L + 1, B)
        mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
    start = rng.standard_normal(T).astype(np.float32)
    end = rng.standard_normal(T).astype(np.float32)
    trans = rng.standard_normal((T, T)).astype(np.float32)
    return em, tags, mask, start, end, trans


@pytest.mark.parametrize("reduction", ["none", "sum", "mean", "token_mean"])
@pytest.mark.parametrize("full_mask", [True, False])
def test_llh_matches_torch(rng, reduction, full_mask):
    em, tags, mask, start, end, trans = rand_case(rng, full_mask=full_mask)
    got = crf_log_likelihood(em, tags, mask, start, end, trans, reduction)
    want = torch_crf_llh(em, tags, mask, start, end, trans, reduction).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_llh_brute_force(rng):
    """Partition function against explicit enumeration of all paths."""
    B, L, T = 2, 4, 3
    em, tags, mask, start, end, trans = rand_case(rng, B, L, T, full_mask=True)
    llh = np.asarray(
        crf_log_likelihood(em, tags, mask, start, end, trans, "none"))
    for b in range(B):
        scores = []
        for path in itertools.product(range(T), repeat=L):
            s = start[path[0]] + em[b, 0, path[0]]
            for i in range(1, L):
                s += trans[path[i - 1], path[i]] + em[b, i, path[i]]
            s += end[path[-1]]
            scores.append(s)
        logz = np.logaddexp.reduce(scores)
        gold = start[tags[b, 0]] + em[b, 0, tags[b, 0]]
        for i in range(1, L):
            gold += trans[tags[b, i - 1], tags[b, i]] + em[b, i, tags[b, i]]
        gold += end[tags[b, -1]]
        np.testing.assert_allclose(llh[b], gold - logz, rtol=1e-4, atol=1e-4)


def test_decode_matches_torch(rng):
    for _ in range(5):
        em, _, mask, start, end, trans = rand_case(rng, B=6, L=11, T=5)
        got = np.asarray(crf_decode(em, mask, start, end, trans))
        want = torch_crf_decode(em, mask, start, end, trans)
        for b, ref in enumerate(want):
            np.testing.assert_array_equal(got[b, : len(ref)], ref)


def test_parallel_decode_matches_sequential(rng):
    """The log-depth associative-scan Viterbi must find paths with the
    same score as the sequential scan (tags may differ only at exact
    float ties, which random inputs avoid)."""
    for trial in range(6):
        em, _, mask, start, end, trans = rand_case(
            rng, B=5, L=13, T=6, full_mask=(trial % 2 == 0))
        seq = np.asarray(crf_decode(em, mask, start, end, trans))
        par = np.asarray(crf_decode_parallel(em, mask, start, end, trans))

        def path_score(tags, b):
            n = int(mask[b].sum())
            s = start[tags[0]] + em[b, 0, tags[0]]
            for i in range(1, n):
                s += trans[tags[i - 1], tags[i]] + em[b, i, tags[i]]
            return s + end[tags[n - 1]]

        for b in range(em.shape[0]):
            np.testing.assert_allclose(path_score(par[b], b),
                                       path_score(seq[b], b),
                                       rtol=1e-4, atol=1e-4)
            n = int(mask[b].sum())
            np.testing.assert_array_equal(par[b, :n], seq[b, :n])


def test_decode_is_argmax_path(rng):
    """Viterbi output beats or ties every enumerated path."""
    B, L, T = 3, 5, 4
    em, _, mask, start, end, trans = rand_case(rng, B, L, T, full_mask=True)
    got = np.asarray(crf_decode(em, mask, start, end, trans))

    def path_score(b, path):
        s = start[path[0]] + em[b, 0, path[0]]
        for i in range(1, L):
            s += trans[path[i - 1], path[i]] + em[b, i, path[i]]
        return s + end[path[-1]]

    for b in range(B):
        best = max(path_score(b, p)
                   for p in itertools.product(range(T), repeat=L))
        np.testing.assert_allclose(path_score(b, got[b]), best, rtol=1e-5)


def test_marginals_sum_to_one_and_match_counts(rng):
    em, _, mask, start, end, trans = rand_case(rng, B=3, L=6, T=4)
    m = np.asarray(crf_marginals(em, mask, start, end, trans))
    np.testing.assert_allclose(m.sum(-1), 1.0, atol=2e-4)
    # Marginals at t=0 from brute force on a full-length sample.
    b = int(np.argmax(mask.sum(1)))
    L = int(mask[b].sum())
    T = em.shape[2]
    joint = np.zeros(T)
    total = []
    for path in itertools.product(range(T), repeat=L):
        s = start[path[0]] + em[b, 0, path[0]]
        for i in range(1, L):
            s += trans[path[i - 1], path[i]] + em[b, i, path[i]]
        s += end[path[-1]]
        total.append((path[0], s))
    logz = np.logaddexp.reduce([s for _, s in total])
    for t0, s in total:
        joint[t0] += np.exp(s - logz)
    np.testing.assert_allclose(m[b, 0], joint, atol=1e-4)


def test_crf_module_grads():
    """CRF flax module trains: nll decreases under gradient steps."""
    T, B, L = 5, 8, 12
    key = jax.random.PRNGKey(0)
    em = jax.random.normal(key, (B, L, T))
    tags = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, T)
    mask = jnp.ones((B, L), jnp.int32)
    crf = CRF(num_tags=T)
    params = crf.init(jax.random.PRNGKey(2), em, tags, mask)

    def loss(p):
        return -crf.apply(p, em, tags, mask, reduction="token_mean")

    l0 = loss(params)
    g = jax.grad(loss)(params)
    params2 = jax.tree.map(lambda p, gg: p - 0.5 * gg, params, g)
    l1 = loss(params2)
    assert l1 < l0


def test_decode_jits_and_batches():
    em = np.random.default_rng(1).standard_normal((16, 128, 15)).astype(np.float32)
    mask = np.ones((16, 128), np.int32)
    start = np.zeros(15, np.float32)
    end = np.zeros(15, np.float32)
    trans = np.zeros((15, 15), np.float32)
    f = jax.jit(crf_decode)
    out = f(em, mask, start, end, trans)
    assert out.shape == (16, 128)
    np.testing.assert_array_equal(np.asarray(out), em.argmax(-1))
