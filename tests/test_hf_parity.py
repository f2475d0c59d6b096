"""Numerical parity vs the installed HF PyTorch implementations.

Tiny randomly-initialised HF models (no network) are converted with
models/convert.py and compared against our Flax modules to ~1e-4.
This is the risk-retiring test for the three model families the
reference uses (SURVEY.md §7.2 item 3, §7.4 item 1).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

# tiny dims: fast on the 1-core CPU test machine
H, FF, LAYERS, HEADS = 32, 64, 2, 4
IMG, PATCH = 32, 16
VOCAB = 99


def _clip_configs():
    from transformers import CLIPTextConfig, CLIPVisionConfig
    text = CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=H, intermediate_size=FF,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=16, projection_dim=H)
    vision = CLIPVisionConfig(
        hidden_size=H, intermediate_size=FF, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, image_size=IMG, patch_size=PATCH,
        projection_dim=H)
    return text, vision


@pytest.fixture(scope="module")
def text_batch():
    rng = np.random.default_rng(0)
    ids = rng.integers(1, VOCAB - 1, size=(2, 10))
    ids[0, 7] = 49407 % VOCAB  # ensure no accidental eos collision
    lens = [10, 6]
    mask = np.zeros_like(ids)
    for i, l in enumerate(lens):
        mask[i, :l] = 1
        ids[i, l - 1] = VOCAB - 1  # eos at the end of each sequence
        ids[i, l:] = 0
    return ids.astype(np.int32), mask.astype(np.int32)


@pytest.fixture(scope="module")
def pixels():
    rng = np.random.default_rng(1)
    return rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)


def test_clip_text_parity(text_batch):
    from transformers import CLIPTextModel
    from sasvqa_tpu.models.clip import CLIPTextConfig as FxCfg, CLIPTextEncoder
    from sasvqa_tpu.models.convert import convert_clip_text

    tcfg, _ = _clip_configs()
    tcfg.eos_token_id = VOCAB - 1
    hf = CLIPTextModel(tcfg).eval()
    ids, mask = text_batch

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long))

    fx = CLIPTextEncoder(FxCfg(
        vocab_size=VOCAB, hidden_size=H, intermediate_size=FF,
        num_layers=LAYERS, num_heads=HEADS, max_position_embeddings=16,
        eos_token_id=VOCAB - 1))
    params = {"params": convert_clip_text(hf.state_dict(), LAYERS)}
    last, pooled = jax.jit(fx.apply)(params, jnp.asarray(ids),
                                     jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(last),
                               ref.last_hidden_state.numpy(),
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(),
                               atol=5e-5, rtol=5e-4)


def test_clip_vision_parity(pixels):
    from transformers import CLIPVisionModelWithProjection
    from sasvqa_tpu.models.clip import (CLIPVisionConfig as FxCfg,
                                        CLIPVisionEncoder)
    from sasvqa_tpu.models.convert import convert_clip_vision

    _, vcfg = _clip_configs()
    hf = CLIPVisionModelWithProjection(vcfg).eval()
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(
            pixels.transpose(0, 3, 1, 2)))  # HF wants NCHW

    fx = CLIPVisionEncoder(FxCfg(
        hidden_size=H, intermediate_size=FF, num_layers=LAYERS,
        num_heads=HEADS, image_size=IMG, patch_size=PATCH,
        projection_dim=H))
    params = {"params": convert_clip_vision(hf.state_dict(), LAYERS)}
    last, pooled, embeds = jax.jit(fx.apply)(params, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(last),
                               ref.last_hidden_state.numpy(),
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(embeds), ref.image_embeds.numpy(),
                               atol=5e-5, rtol=5e-4)


def _git_model(num_frames=None):
    # num_image_with_embedding creates HF's temporal embeddings, which are
    # zero-init; the reference fork never adds them (modeling.py:86), so a
    # random-init HF model stays numerically equal to our fork semantics.
    from transformers import GitConfig, GitVisionConfig, GitForCausalLM
    vision = GitVisionConfig(
        hidden_size=H, intermediate_size=FF, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, image_size=IMG, patch_size=PATCH)
    cfg = GitConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=FF,
        max_position_embeddings=64, vision_config=vision.to_dict(),
        num_image_with_embedding=num_frames)
    return GitForCausalLM(cfg).eval()


def _fx_git():
    from sasvqa_tpu.models.clip import CLIPVisionConfig as FxV
    from sasvqa_tpu.models.git import GITConfig, GITForCausalLM
    cfg = GITConfig(
        vocab_size=VOCAB, hidden_size=H, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=FF, max_position_embeddings=64,
        sep_token_id=VOCAB - 1,
        vision=FxV(hidden_size=H, intermediate_size=FF, num_layers=LAYERS,
                   num_heads=HEADS, image_size=IMG, patch_size=PATCH))
    return GITForCausalLM(cfg)


def test_git_parity(text_batch, pixels):
    from sasvqa_tpu.models.convert import convert_git

    hf = _git_model(num_frames=2)
    ids, mask = text_batch
    frames = np.stack([pixels, pixels * 0.5], axis=1)  # (B, T=2, H, W, C)

    with torch.no_grad():
        # HF multi-frame path: (B, T, C, H, W)
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long),
                 pixel_values=torch.tensor(
                     frames.transpose(0, 1, 4, 2, 3)))

    fx = _fx_git()
    params = {"params": convert_git(hf.state_dict(), LAYERS, LAYERS)}
    out = jax.jit(lambda p, i, m, x: fx.apply(p, i, m, x))(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               ref.logits.numpy(), atol=1e-4, rtol=5e-4)


def test_git_loss_matches_hf(text_batch, pixels):
    """Loss parity incl. the image-token shift (modeling.py:221-225)."""
    from sasvqa_tpu.models.convert import convert_git

    hf = _git_model()
    ids, mask = text_batch
    frames = pixels[:, None]  # single frame
    labels = np.where(mask == 1, ids, -100)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long),
                 pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)))
        # Reference loss semantics (modeling.py:219-225): explicit CE on
        # singly-shifted logits/labels.  (The *installed* HF version's
        # generic ForCausalLMLoss re-shifts labels a second time — a
        # newer-HF behavior the reference fork never had, so ref.loss is
        # not the oracle here.)
        m = ref.logits.shape[1] - ids.shape[1]
        shifted = ref.logits[:, m:-1, :]
        lab = torch.tensor(labels, dtype=torch.long)[:, 1:]
        ref_loss = torch.nn.functional.cross_entropy(
            shifted.reshape(-1, VOCAB), lab.reshape(-1), ignore_index=-100)

    fx = _fx_git()
    params = {"params": convert_git(hf.state_dict(), LAYERS, LAYERS)}
    out = jax.jit(lambda p, i, m, x, l: fx.apply(p, i, m, x, labels=l))(
        params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(frames),
        jnp.asarray(labels))
    np.testing.assert_allclose(float(out["loss"]), float(ref_loss),
                               atol=5e-5, rtol=5e-4)


def test_git_greedy_generate_matches_hf(text_batch, pixels):
    """Cached greedy decode == HF generate (greedy) on the same weights."""
    from sasvqa_tpu.models.convert import convert_git
    from sasvqa_tpu.models.git import greedy_generate

    hf = _git_model()
    ids, mask = text_batch
    prompt_len = mask.sum(-1)
    frames = pixels[:, None]

    max_text_len = 16
    with torch.no_grad():
        # HF path: feed each example separately (unpadded prompt) to dodge
        # HF's left-pad position bug; greedy search.
        refs = []
        for b in range(ids.shape[0]):
            l = int(prompt_len[b])
            gen = hf.generate(
                input_ids=torch.tensor(ids[b:b + 1, :l], dtype=torch.long),
                pixel_values=torch.tensor(
                    pixels[b:b + 1].transpose(0, 3, 1, 2)),
                max_length=max_text_len, do_sample=False,
                eos_token_id=VOCAB - 1, pad_token_id=0)
            refs.append(gen[0, l:].tolist())

    fx = _fx_git()
    params = {"params": convert_git(hf.state_dict(), LAYERS, LAYERS)}
    ours = greedy_generate(fx, params, jnp.asarray(ids),
                           jnp.asarray(prompt_len), jnp.asarray(frames),
                           max_text_len=max_text_len)
    ours = np.asarray(ours)
    def upto(seq, stops):
        """Prefix before the first stop token — truncation, not
        filtering: filtering pad/eos out of BOTH sides would hide a
        divergence that merely shifts tokens across a pad (e.g. ours
        [5,0,7] vs HF [5,7] both filter to [5,7])."""
        out = []
        for t in seq:
            if t in stops:
                break
            out.append(t)
        return out

    for b in range(ids.shape[0]):
        ref_toks = upto(refs[b], (0, VOCAB - 1))
        our_toks = upto(ours[b].tolist(), (0, VOCAB - 1))
        assert our_toks == ref_toks, (b, our_toks, ref_toks)


def test_git_generate_with_padded_rows(text_batch, pixels):
    """Batch-padding rows (prompt_len=0 — pad_batch_to_multiple produces
    these for ad-hoc batches; eval's index-tiled batch plan repeats real
    rows instead) must not disturb real rows' outputs and must keep the
    last-token gather in-bounds (models/git.py prompt_fill clamps
    prompt_len-1 to >= 0)."""
    from sasvqa_tpu.models.git import greedy_generate

    fx = _fx_git()
    ids, mask = text_batch
    prompt_len = mask.sum(-1)
    frames = pixels[:, None]
    params = jax.jit(fx.init)(jax.random.key(0), jnp.asarray(ids),
                              jnp.asarray(mask), jnp.asarray(frames))

    base = np.asarray(greedy_generate(
        fx, params, jnp.asarray(ids), jnp.asarray(prompt_len),
        jnp.asarray(frames), max_text_len=16))

    pad_rows = 2
    ids_p = np.pad(ids, ((0, pad_rows), (0, 0)))
    pl_p = np.pad(prompt_len, (0, pad_rows))          # prompt_len=0 rows
    frames_p = np.pad(frames, ((0, pad_rows),) + ((0, 0),) * (frames.ndim - 1))
    padded = np.asarray(greedy_generate(
        fx, params, jnp.asarray(ids_p), jnp.asarray(pl_p),
        jnp.asarray(frames_p), max_text_len=16))
    # padded rows must not disturb the real rows' decode
    np.testing.assert_array_equal(padded[:ids.shape[0]], base)


def test_blip_parity(text_batch, pixels):
    from transformers import BlipTextConfig, BlipVisionConfig, BlipConfig
    from transformers.models.blip.modeling_blip import BlipVisionModel
    from transformers.models.blip.modeling_blip_text import BlipTextModel
    from sasvqa_tpu.models.blip import (BLIPTextConfig as FxT,
                                        BLIPVisionConfig as FxV,
                                        BLIPTextEncoder, BLIPVisionEncoder)
    from sasvqa_tpu.models.convert import convert_blip_text, convert_blip_vision

    vcfg = BlipVisionConfig(hidden_size=H, intermediate_size=FF,
                            num_hidden_layers=LAYERS,
                            num_attention_heads=HEADS, image_size=IMG,
                            patch_size=PATCH)
    tcfg = BlipTextConfig(vocab_size=VOCAB, hidden_size=H,
                          intermediate_size=FF, num_hidden_layers=LAYERS,
                          num_attention_heads=HEADS,
                          max_position_embeddings=32, encoder_hidden_size=H,
                          is_decoder=False)
    hf_v = BlipVisionModel(vcfg).eval()
    ids, mask = text_batch

    with torch.no_grad():
        ref_v = hf_v(pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2)))

    fx_v = BLIPVisionEncoder(FxV(hidden_size=H, intermediate_size=FF,
                                 num_layers=LAYERS, num_heads=HEADS,
                                 image_size=IMG, patch_size=PATCH))
    pv = {"params": convert_blip_vision(hf_v.state_dict(), LAYERS)}
    last_v, pooled_v = jax.jit(fx_v.apply)(pv, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(last_v),
                               ref_v.last_hidden_state.numpy(),
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(pooled_v),
                               ref_v.pooler_output.numpy(),
                               atol=5e-5, rtol=5e-4)

    # text side without cross-attention (pure BERT encoder parity)
    hf_t = BlipTextModel(tcfg, add_pooling_layer=True).eval()
    with torch.no_grad():
        ref_t = hf_t(input_ids=torch.tensor(ids, dtype=torch.long),
                     attention_mask=torch.tensor(mask, dtype=torch.long))
    fx_t = BLIPTextEncoder(FxT(vocab_size=VOCAB, hidden_size=H,
                               intermediate_size=FF, num_layers=LAYERS,
                               num_heads=HEADS, max_position_embeddings=32))
    pt = {"params": convert_blip_text(hf_t.state_dict(), LAYERS, prefix="",
                                      cross_attention=False)}
    last_t, pooled_t = jax.jit(
        lambda p, i, m: fx_t.apply(p, i, m))(pt, jnp.asarray(ids),
                                             jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(last_t),
                               ref_t.last_hidden_state.numpy(),
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(pooled_t),
                               ref_t.pooler_output.numpy(),
                               atol=5e-5, rtol=5e-4)


def test_blip_cross_attention_asymmetric_widths(text_batch):
    """BLIP text cross-attention over a WIDER vision stream (blip-large:
    vision 1024 vs text 768) must project K/V into the TEXT hidden size
    like HF — the old project_kv used the encoder width, which broke
    at init for any asymmetric config (r3 review finding).  Parity vs
    HF BlipTextModel with encoder_hidden_size = 2*hidden."""
    from transformers import BlipTextConfig
    from transformers.models.blip.modeling_blip_text import BlipTextModel
    from sasvqa_tpu.models.blip import (BLIPTextConfig as FxT,
                                        BLIPTextEncoder)
    from sasvqa_tpu.models.convert import convert_blip_text

    enc_w = 2 * H                      # asymmetric: vision wider
    # is_decoder=True only GATES the crossattention modules' existence
    # in HF BlipTextLayer; causality is the forward()'s own is_decoder
    # flag, which the reference never passes (modeling.py:307-315) — so
    # the run below is bidirectional + cross-attention, like ours
    tcfg = BlipTextConfig(vocab_size=VOCAB, hidden_size=H,
                          intermediate_size=FF, num_hidden_layers=LAYERS,
                          num_attention_heads=HEADS,
                          max_position_embeddings=32,
                          encoder_hidden_size=enc_w, is_decoder=True)
    hf = BlipTextModel(tcfg, add_pooling_layer=True).eval()
    ids, mask = text_batch
    rng = np.random.default_rng(5)
    enc_states = rng.normal(size=(ids.shape[0], 7, enc_w)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long),
                 encoder_hidden_states=torch.tensor(enc_states))

    fx = BLIPTextEncoder(FxT(vocab_size=VOCAB, hidden_size=H,
                             intermediate_size=FF, num_layers=LAYERS,
                             num_heads=HEADS, max_position_embeddings=32,
                             encoder_width=enc_w))
    pt = {"params": convert_blip_text(hf.state_dict(), LAYERS, prefix="",
                                      cross_attention=True)}
    last, pooled = jax.jit(
        lambda p, i, m, e: fx.apply(p, i, m, encoder_hidden=e))(
        pt, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(enc_states))
    np.testing.assert_allclose(np.asarray(last),
                               ref.last_hidden_state.numpy(),
                               atol=5e-5, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(),
                               atol=5e-5, rtol=5e-4)


def test_clip_text_projection_parity(text_batch):
    """with_projection text tower == HF CLIPTextModelWithProjection."""
    from transformers import CLIPTextModelWithProjection
    from sasvqa_tpu.models.clip import CLIPTextConfig as FxCfg, CLIPTextEncoder
    from sasvqa_tpu.models.convert import convert_clip_text

    tcfg, _ = _clip_configs()
    tcfg.eos_token_id = VOCAB - 1
    hf = CLIPTextModelWithProjection(tcfg).eval()
    ids, mask = text_batch
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long))

    fx = CLIPTextEncoder(FxCfg(
        vocab_size=VOCAB, hidden_size=H, intermediate_size=FF,
        num_layers=LAYERS, num_heads=HEADS, max_position_embeddings=16,
        eos_token_id=VOCAB - 1), with_projection=True, projection_dim=H)
    params = {"params": convert_clip_text(hf.state_dict(), LAYERS)}
    _, pooled = jax.jit(fx.apply)(params, jnp.asarray(ids),
                                  jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.text_embeds.numpy(),
                               atol=5e-5, rtol=5e-4)
