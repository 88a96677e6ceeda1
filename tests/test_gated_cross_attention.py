"""GatedCrossAttention parity vs a torch implementation of the reference's
Bart-style MHA semantics (`cross_attention_Y`: pre-scaled queries, masked
fill, temperature tau, optional 1−softmax negation, additive prior)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from icka_tpu.nn.attention import GatedCrossAttention


def torch_gated_mha(weights, x, kv, tau=1.0, neg_type=False, prior=None,
                    key_mask=None, num_heads=4):
    """Reference math (Cross_Modal_Interaction_Module.py:732-837)."""
    x = torch.as_tensor(x)
    kv = torch.as_tensor(kv)
    B, Tq, D = x.shape
    Hd = D // num_heads

    def lin(name, inp):
        w = torch.as_tensor(weights[name]["kernel"]).T
        b = torch.as_tensor(weights[name]["bias"])
        return inp @ w.T + b

    q = lin("q_proj", x) * (Hd ** -0.5)
    k = lin("k_proj", kv)
    v = lin("v_proj", kv)

    def shape(t, L):
        return t.view(B, L, num_heads, Hd).transpose(1, 2)

    q, k, v = shape(q, Tq), shape(k, kv.shape[1]), shape(v, kv.shape[1])
    attn = q @ k.transpose(-1, -2)
    if key_mask is not None:
        m = torch.as_tensor(key_mask)[:, None, None, :] == 0
        attn = attn.masked_fill(m, -10000.0)
    attn = torch.softmax(attn / tau, dim=-1)
    if neg_type:
        attn = 1.0 - attn
    if prior is not None:
        attn = attn + torch.as_tensor(prior)[:, None]
    out = (attn @ v).transpose(1, 2).reshape(B, Tq, D)
    return lin("out_proj", out).numpy()


def test_gated_cross_attention_matches_reference(rng):
    B, Tq, Tk, D, N = 2, 3, 5, 16, 4
    x = rng.standard_normal((B, Tq, D)).astype(np.float32)
    kv = rng.standard_normal((B, Tk, D)).astype(np.float32)
    key_mask = np.ones((B, Tk), np.int32)
    key_mask[1, -2:] = 0
    bias = ((1.0 - key_mask) * -10000.0)[:, None, None, :] \
        .astype(np.float32)

    m = GatedCrossAttention(embed_dim=D, num_heads=N, dropout_rate=0.0)
    params = m.init(jax.random.PRNGKey(0), x, kv, jnp.asarray(bias))
    w = jax.tree.map(np.asarray, params["params"])

    for tau, neg, use_prior in [(1.0, False, False), (0.5, False, False),
                                (1.0, True, False), (1.0, False, True)]:
        prior = (rng.standard_normal((B, Tq, Tk)).astype(np.float32) * 0.1
                 if use_prior else None)
        got = m.apply(params, x, kv, jnp.asarray(bias), tau=tau,
                      neg_type=neg,
                      prior=None if prior is None
                      else jnp.asarray(prior)[:, None])
        want = torch_gated_mha(w, x, kv, tau=tau, neg_type=neg,
                               prior=prior, key_mask=key_mask, num_heads=N)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                                   rtol=1e-4, err_msg=f"tau={tau} neg={neg}")
