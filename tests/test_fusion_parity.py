"""Fusion head vs torch.nn.TransformerDecoder (the reference's dec-only
CrossAttentionLayer, modeling.py:366-374: post-LN, ReLU, d_ff=4d,
nhead=8, batch_first, tgt_key_padding_mask)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sasvqa_tpu.models.fusion import TransformerDecoderLayer

D, NHEAD = 32, 4


def _torch_layer():
    torch.manual_seed(0)
    layer = torch.nn.TransformerDecoderLayer(
        d_model=D, nhead=NHEAD, dim_feedforward=4 * D, dropout=0.0,
        batch_first=True, activation=torch.nn.functional.relu)
    return layer.eval()


def _convert(layer):
    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}

    def qkv_split(prefix):
        w = sd[f"{prefix}.in_proj_weight"]   # (3D, D)
        b = sd[f"{prefix}.in_proj_bias"]
        return ((w[:D].T, b[:D]), (w[D:2*D].T, b[D:2*D]),
                (w[2*D:].T, b[2*D:]))

    def mha(prefix):
        (qw, qb), (kw, kb), (vw, vb) = qkv_split(prefix)
        return {
            "q_proj": {"kernel": qw, "bias": qb},
            "k_proj": {"kernel": kw, "bias": kb},
            "v_proj": {"kernel": vw, "bias": vb},
            "out_proj": {"kernel": sd[f"{prefix}.out_proj.weight"].T,
                         "bias": sd[f"{prefix}.out_proj.bias"]},
        }

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    return {"params": {
        "self_attn": mha("self_attn"),
        "cross_attn": mha("multihead_attn"),
        "linear1": {"kernel": sd["linear1.weight"].T,
                    "bias": sd["linear1.bias"]},
        "linear2": {"kernel": sd["linear2.weight"].T,
                    "bias": sd["linear2.bias"]},
        "norm1": ln("norm1"), "norm2": ln("norm2"), "norm3": ln("norm3"),
    }}


def test_decoder_layer_matches_torch():
    layer = _torch_layer()
    rng = np.random.default_rng(0)
    b, lt, lv = 2, 7, 5
    tgt = rng.normal(size=(b, lt, D)).astype(np.float32)
    mem = rng.normal(size=(b, lv, D)).astype(np.float32)
    pad = np.zeros((b, lt), bool)
    pad[0, -2:] = True  # padding on example 0

    with torch.no_grad():
        ref = layer(torch.tensor(tgt), torch.tensor(mem),
                    tgt_key_padding_mask=torch.tensor(pad))

    fx = TransformerDecoderLayer(num_heads=NHEAD, dropout_rate=0.0)
    params = _convert(layer)
    # our convention: 1 = valid
    mask = jnp.asarray((~pad).astype(np.int32))
    out = jax.jit(lambda p: fx.apply(p, jnp.asarray(tgt), jnp.asarray(mem),
                                     tgt_key_padding_mask=mask))(params)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("attn_type", ["enc-dec", "dec-cas", "dec-only"])
def test_fusion_variants_run(attn_type):
    """All three reference CrossAttentionLayer variants
    (modeling.py:355-390) produce finite, text-shaped outputs."""
    from sasvqa_tpu.models.fusion import CrossAttentionFusion
    rng = np.random.default_rng(1)
    txt = jnp.asarray(rng.normal(size=(2, 6, D)), jnp.float32)
    vis = jnp.asarray(rng.normal(size=(2, 4, D)), jnp.float32)
    mask = jnp.ones((2, 6), jnp.int32)
    mod = CrossAttentionFusion(num_heads=NHEAD, dropout_rate=0.0,
                               attn_type=attn_type)
    params = jax.jit(lambda: mod.init(jax.random.key(0), txt, vis, mask))()
    out = jax.jit(lambda p: mod.apply(p, txt, vis, mask))(params)
    assert out.shape == (2, 6, D)
    assert np.isfinite(np.asarray(out)).all()
