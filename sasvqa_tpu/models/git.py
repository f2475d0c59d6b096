"""Flax GIT (GenerativeImage2Text) causal-LM for video QA.

Rebuild of the reference's forked GIT path (src/modeling/modeling.py:29-263
``MyGitModel``/``MyGitForCausalLM``), TPU-first:

- **Batched frame encoding.**  The reference encodes frames in a Python
  loop (modeling.py:83-87); here all B*T frames go through the vision
  tower as one batch and reshape to a (B, T*P, D) visual prefix.  This
  is numerically identical because the fork *disables* the per-frame
  temporal embedding add (modeling.py:86 is commented out) — frames are
  interchangeable through the encoder.
- **Image K/V caching at decode time.**  GIT's attention mask lets image
  tokens attend only to image tokens (HF ``GitModel.create_attention_mask``),
  so per-layer image hidden states are independent of the text.  The HF
  generate path re-runs the full vision stack + all M image positions
  every decode step; here the prompt-fill pass caches per-layer image
  K/V once and each decode step processes exactly one token.
- **Right-padded prompts with correct positions.**  The reference
  left-pads eval prompts (dataset_video_qa.py:320,394) which, combined
  with GIT's absolute position embeddings, mis-positions the prompt.
  We right-pad and track per-example lengths instead (deliberate fix,
  documented per SURVEY.md §7.4 item 7).

Loss matches MyGitForCausalLM.forward (modeling.py:219-225): logits
shifted past the ``num_image_tokens`` prefix, CE ignoring -100.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sasvqa_tpu.models.clip import CLIPVisionConfig, CLIPVisionEncoder
from sasvqa_tpu.models.layers import BertFFN, merge_heads, split_heads
from sasvqa_tpu.ops.attention import NEG_INF, dot_product_attention


@dataclasses.dataclass(frozen=True)
class GITConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 1024
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    dropout: float = 0.1
    # attention-PROBABILITY dropout (HF GitConfig
    # attention_probs_dropout_prob default 0.1): the reference trains
    # through HF GitSelfAttention's dropout on softmax weights
    # (modeling.py:29-163 runs HF GitLayer internals).  Applied
    # in-kernel by the Pallas path (ops/git_flash._hash_keep) and by the
    # same hash mask on the dense path — PARITY #8 retired r4.
    attention_dropout: float = 0.1
    pad_token_id: int = 0
    cls_token_id: int = 101
    sep_token_id: int = 102  # doubles as EOS for generation
    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=lambda: CLIPVisionConfig(patch_size=16))

    @property
    def tokens_per_frame(self) -> int:
        return (self.vision.image_size // self.vision.patch_size) ** 2 + 1


GIT_BASE = GITConfig()


class GitAttention(nn.Module):
    """BERT-style attention block with a fused QKV projection and the
    K/V exposed for decode caching.

    Fused QKV: one (D, 3D) matmul instead of three (D, D) — the MXU runs
    D=768 x 3D matmuls ~2x faster than three D x D ones on v5e.
    """

    hidden_size: int
    num_heads: int
    layer_norm_eps: float
    dropout_rate: float
    attn_dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.qkv = nn.Dense(3 * self.hidden_size, dtype=self.dtype)
        self.out_dense = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.out_ln = nn.LayerNorm(epsilon=self.layer_norm_eps,
                                   dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def project(self, hidden: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        q, k, v = jnp.split(self.qkv(hidden), 3, axis=-1)
        return (split_heads(q, self.num_heads),
                split_heads(k, self.num_heads),
                split_heads(v, self.num_heads))

    def finish(self, hidden: jax.Array, q: jax.Array, k: jax.Array,
               v: jax.Array, bias: Optional[jax.Array],
               deterministic: bool = True,
               use_flash: Optional[bool] = None,
               git_mask: Optional[Tuple[int, jax.Array]] = None) -> jax.Array:
        # attention-probability dropout (HF GitSelfAttention semantics,
        # reference training path — PARITY #8): per-(layer, step) seed
        # from the flax dropout stream; the coordinate hash
        # (ops/git_flash._hash_keep) decorrelates (b, h, row, col)
        drop_on = self.attn_dropout_rate > 0.0 and not deterministic
        seed = None
        if drop_on:
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(self.make_rng("dropout"), (), jnp.uint32),
                jnp.int32)
        if git_mask is not None:
            from sasvqa_tpu.ops.git_flash import git_flash_attention
            num_img, attention_mask = git_mask
            # deterministic == eval/inference: hint the block chooser
            # that no backward is coming (perf-only; grads through a
            # deterministic forward still work — r3 advisor finding)
            ctx = merge_heads(git_flash_attention(
                q, k, v, attention_mask, num_img,
                fwd_only=deterministic,
                dropout_rate=self.attn_dropout_rate if drop_on else 0.0,
                dropout_seed=seed))
        elif drop_on:
            # non-Pallas training path (flash off / CPU): dense XLA with
            # the SAME hash mask the kernels generate — train-on-CPU and
            # train-on-TPU make identical masking decisions per seed
            from sasvqa_tpu.ops.git_flash import (
                dense_attention_with_hash_dropout)
            ctx = merge_heads(dense_attention_with_hash_dropout(
                q, k, v, bias, seed, self.attn_dropout_rate))
        else:
            ctx = merge_heads(dot_product_attention(q, k, v, bias=bias,
                                                    use_flash=use_flash))
        out = self.drop(self.out_dense(ctx), deterministic=deterministic)
        return self.out_ln(hidden + out)

    def finish_from_ctx(self, hidden: jax.Array, ctx: jax.Array,
                        deterministic: bool = True) -> jax.Array:
        """Output projection + residual LN for a context computed by the
        caller (decode path computes attention itself to keep the KV
        cache split — see GITForCausalLM.decode_step)."""
        out = self.drop(self.out_dense(ctx), deterministic=deterministic)
        return self.out_ln(hidden + out)

    def __call__(self, hidden, bias=None, deterministic=True, use_flash=None):
        q, k, v = self.project(hidden)
        return self.finish(hidden, q, k, v, bias, deterministic, use_flash)


class GitLayer(nn.Module):
    config: GITConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.config
        self.attention = GitAttention(c.hidden_size, c.num_heads,
                                      c.layer_norm_eps, c.dropout,
                                      attn_dropout_rate=c.attention_dropout,
                                      dtype=self.dtype)
        # shared BERT FFN block: identical structure AND param names
        # (intermediate/output/ln), so converters and checkpoints are
        # unaffected by the swap
        self.ffn = BertFFN(c.intermediate_size, c.hidden_act,
                           c.layer_norm_eps, c.dropout, dtype=self.dtype)

    def __call__(self, x, bias=None, deterministic=True, use_flash=None,
                 git_mask=None):
        q, k, v = self.attention.project(x)
        x = self.attention.finish(x, q, k, v, bias, deterministic,
                                  use_flash, git_mask=git_mask)
        return self.ffn(x, deterministic=deterministic)

    def full_with_kv(self, x, bias=None, deterministic=True, use_flash=None,
                     git_mask=None):
        """Forward pass that also returns this layer's input K/V (for
        building decode caches during prompt fill)."""
        q, k, v = self.attention.project(x)
        h = self.attention.finish(x, q, k, v, bias, deterministic,
                                  use_flash, git_mask=git_mask)
        return self.ffn(h, deterministic=deterministic), (k, v)



def git_attention_bias(num_img: int, attention_mask: jax.Array,
                       dtype=jnp.float32) -> jax.Array:
    """The GIT combined mask (HF GitModel.create_attention_mask semantics):

    - image rows attend to image columns only;
    - text rows attend to all image columns + causal text columns,
      additionally masked by the text padding mask.

    Returns (B, 1, M+L, M+L) additive bias.
    """
    b, l = attention_mask.shape
    m = num_img
    s = m + l
    idx = jnp.arange(s)
    is_text_row = (idx >= m)[:, None]
    is_text_col = (idx >= m)[None, :]
    # causal over text block (global indices)
    causal_ok = idx[None, :] <= idx[:, None]
    ok = jnp.where(
        is_text_row,
        jnp.where(is_text_col, causal_ok, True),   # text row: img ok, text causal
        ~is_text_col,                               # img row: img only
    )
    base = jnp.where(ok, 0.0, NEG_INF)[None, None]  # (1,1,S,S)
    # text-key padding applies to text rows x text cols
    pad = (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF  # (B, L)
    pad_cols = jnp.pad(pad, ((0, 0), (m, 0)))[:, None, None, :]  # (B,1,1,S)
    pad_bias = jnp.where(is_text_row[None, None], pad_cols, 0.0)
    return (base + pad_bias).astype(dtype)


class GITForCausalLM(nn.Module):
    """GIT causal LM over a [visual prefix; text] sequence.

    ``flash``: None = auto (specialized Pallas kernel on TPU when the
    combined sequence is long enough), True/False = force.
    """

    config: GITConfig
    dtype: jnp.dtype = jnp.float32
    flash: Optional[bool] = None
    remat: bool = False  # remat the vision tower (many-frame configs)
    remat_policy: Optional[str] = None  # see CLIPVisionEncoder.remat_policy

    def _use_git_flash(self, seq_len: int) -> bool:
        if self.flash is not None:
            return self.flash
        from sasvqa_tpu.ops.attention import flash_backend_ok
        return seq_len >= 512 and flash_backend_ok()

    def setup(self):
        c = self.config
        self.image_encoder = CLIPVisionEncoder(
            c.vision, dtype=self.dtype, post_ln_all_tokens=True,
            with_projection=False, remat=self.remat,
            remat_policy=self.remat_policy)
        self.visual_projection = nn.Dense(c.hidden_size, dtype=self.dtype)
        self.visual_projection_ln = nn.LayerNorm(
            epsilon=c.vision.layer_norm_eps, dtype=self.dtype)
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size,
                                        dtype=self.dtype)
        self.position_embeddings = nn.Embed(c.max_position_embeddings,
                                            c.hidden_size, dtype=self.dtype)
        self.emb_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype)
        self.emb_drop = nn.Dropout(c.dropout)
        self.layer = [GitLayer(c, dtype=self.dtype, name=f"layer_{i}")
                      for i in range(c.num_layers)]
        self.output = nn.Dense(c.vocab_size, dtype=self.dtype)

    # ---- shared pieces -------------------------------------------------

    def encode_frames(self, pixel_values: jax.Array) -> jax.Array:
        """(B, T, H, W, C) -> projected visual prefix (B, T*P, D).

        Batched equivalent of the reference per-frame loop with temporal
        embeddings disabled (modeling.py:81-95).  Accepts u8-staged
        pixels (core/pixels wire format) — dequant fuses into the patch
        conv input.
        """
        from sasvqa_tpu.core.pixels import maybe_dequantize
        pixel_values = maybe_dequantize(pixel_values, self.dtype)
        b, t = pixel_values.shape[:2]
        flat = pixel_values.reshape((b * t,) + pixel_values.shape[2:])
        feats, _, _ = self.image_encoder(flat)          # (B*T, P, Dv)
        p, dv = feats.shape[-2:]
        feats = feats.reshape(b, t * p, dv)
        return self.visual_projection_ln(self.visual_projection(feats))

    def embed_text(self, input_ids: jax.Array, positions: jax.Array,
                   deterministic: bool = True) -> jax.Array:
        x = self.word_embeddings(input_ids) + self.position_embeddings(positions)
        return self.emb_drop(self.emb_ln(x), deterministic=deterministic)

    # ---- training / scoring forward ------------------------------------

    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 pixel_values: jax.Array,
                 labels: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 ) -> Dict[str, jax.Array]:
        """Training/scoring pass.

        input_ids/attention_mask: (B, L); pixel_values: (B, T, H, W, C);
        labels: (B, L) with -100 ignored.  Returns dict with ``logits``
        (B, M+L, V) and, when labels given, scalar ``loss``.
        """
        b, l = input_ids.shape
        vis = self.encode_frames(pixel_values)          # (Bv, M, D)
        # groups with >1 example share one video: repeat encoded prefix
        # (post-encoder, so the ViT runs once per video)
        if vis.shape[0] != b:
            vis = jnp.repeat(vis, b // vis.shape[0], axis=0)
        m = vis.shape[1]
        txt = self.embed_text(input_ids, jnp.arange(l)[None, :],
                              deterministic=deterministic)
        h = jnp.concatenate([vis, txt], axis=1)
        if self._use_git_flash(m + l):
            bias, git_mask = None, (m, attention_mask)
        else:
            bias, git_mask = git_attention_bias(
                m, attention_mask, dtype=self.dtype), None
        for lyr in self.layer:
            h = lyr(h, bias=bias, deterministic=deterministic,
                    git_mask=git_mask)

        if labels is None:
            return {"logits": self.output(h).astype(jnp.float32)}

        # Training: the loss reads only text-position logits (shifted past
        # the image prefix, modeling.py:221-225), so the vocab projection
        # runs on the L text positions instead of all M+L — at 8 frames
        # that is a ~25x smaller (seq x vocab) matmul.
        shifted = self.output(h[:, m:-1, :]).astype(jnp.float32)
        tgt = labels[:, 1:]
        valid = tgt != -100
        tgt_safe = jnp.where(valid, tgt, 0)
        logp = jax.nn.log_softmax(shifted, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_safe[..., None],
                                   axis=-1)[..., 0]
        loss = (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
        return {"logits_text": shifted, "loss": loss}

    # ---- generation -----------------------------------------------------

    def prompt_fill(self, input_ids: jax.Array, prompt_len: jax.Array,
                    pixel_values: jax.Array, max_text_len: int,
                    ) -> Tuple[jax.Array, Any]:
        """Process image + right-padded prompt; build decode caches.

        input_ids: (B, Lp) right-padded prompts; prompt_len: (B,) actual
        lengths.  Returns (first generated token logits (B, V), cache
        pytree).  The text K/V cache is sized to ``max_text_len``.
        """
        b, lp = input_ids.shape
        assert lp <= max_text_len, (
            f"prompt width {lp} exceeds the decode budget {max_text_len}")
        attention_mask = (jnp.arange(lp)[None, :]
                          < prompt_len[:, None]).astype(jnp.int32)
        vis = self.encode_frames(pixel_values)
        if vis.shape[0] != b:
            vis = jnp.repeat(vis, b // vis.shape[0], axis=0)
        m = vis.shape[1]
        txt = self.embed_text(input_ids, jnp.arange(lp)[None, :])
        h = jnp.concatenate([vis, txt], axis=1)
        if self._use_git_flash(m + lp):
            bias, git_mask = None, (m, attention_mask)
        else:
            bias, git_mask = git_attention_bias(
                m, attention_mask, dtype=self.dtype), None

        img_kv, txt_kv = [], []
        for lyr in self.layer:
            h, (k, v) = lyr.full_with_kv(h, bias=bias, git_mask=git_mask)
            img_kv.append((k[:, :, :m], v[:, :, :m]))
            # text K/V padded out to the full decode budget
            pad = max_text_len - lp
            txt_kv.append((jnp.pad(k[:, :, m:], ((0, 0), (0, 0), (0, pad), (0, 0))),
                           jnp.pad(v[:, :, m:], ((0, 0), (0, 0), (0, pad), (0, 0)))))
        # only each prompt's LAST-token hidden state is read (it predicts
        # the first new token), so gather that row BEFORE the (D -> V)
        # vocab projection — same "project only what gets read" rule the
        # training path applies to its loss positions above.  Clamp so
        # batch-padding rows (prompt_len=0) read position 0 instead of
        # wrapping to -1 (their output is discarded upstream, but the
        # gather must stay in-bounds).
        last_pos = jnp.maximum(prompt_len - 1, 0)
        h_txt = h[:, m:]                               # (B, Lp, D)
        h_last = jnp.take_along_axis(
            h_txt, last_pos[:, None, None].repeat(h_txt.shape[-1],
                                                  axis=-1), axis=1)
        last = self.output(h_last).astype(jnp.float32)[:, 0]  # (B, V)
        cache = {"img_kv": img_kv, "txt_kv": txt_kv, "cur_len": prompt_len}
        return last, cache

    def decode_step(self, token: jax.Array, cache: Any,
                    ) -> Tuple[jax.Array, Any]:
        """One greedy-decode step: token (B,) -> (next logits (B, V), cache)."""
        b = token.shape[0]
        cur = cache["cur_len"]                           # (B,)
        max_len = cache["txt_kv"][0][0].shape[2]         # static buffer size
        h = self.embed_text(token[:, None], cur[:, None])  # (B, 1, D)

        onehot = (jnp.arange(max_len)[None, :]
                  == cur[:, None]).astype(self.dtype)     # (B, maxlen)
        # text cols valid where idx <= cur (inclusive of the new token)
        valid = jnp.arange(max_len)[None, :] <= cur[:, None]
        txt_bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]

        new_txt_kv = []
        for i, lyr in enumerate(self.layer):
            k_img, v_img = cache["img_kv"][i]
            k_txt, v_txt = cache["txt_kv"][i]
            q, k_new, v_new = lyr.attention.project(h)   # (B, H, 1, Dh)
            sel = onehot[:, None, :, None]
            k_txt = k_txt * (1 - sel) + k_new * sel
            v_txt = v_txt * (1 - sel) + v_new * sel
            new_txt_kv.append((k_txt, v_txt))
            # SPLIT-cache attention: score the image and text caches in
            # place and concatenate only the (B, H, 1, M+maxlen) score
            # vectors.  A concatenate([k_img, k_txt]) here materialises
            # a copy of the whole image K/V cache on top of the
            # unavoidable cache *reads*; removing it measured 1.86 ->
            # 1.78 ms/token (r4) — the rest of the gap to the ~0.75
            # cache-read floor is M=1 underfill, and a Pallas decode
            # kernel LOST 4.3x to this XLA form (BASELINE.md r4 decode
            # notes).  Same numerics as ops/attention._xla_attention:
            # f32 scores/softmax, bf16 probs @ v with f32 accumulation.
            scale = q.shape[-1] ** -0.5
            s_img = jnp.einsum("bhqd,bhkd->bhqk", q, k_img,
                               preferred_element_type=jnp.float32) * scale
            s_txt = jnp.einsum("bhqd,bhkd->bhqk", q, k_txt,
                               preferred_element_type=jnp.float32) * scale
            s_txt = s_txt + txt_bias.astype(jnp.float32)
            m = k_img.shape[2]
            probs = jax.nn.softmax(
                jnp.concatenate([s_img, s_txt], axis=-1), axis=-1
            ).astype(q.dtype)
            ctx = (jnp.einsum("bhqk,bhkd->bhqd", probs[..., :m], v_img,
                              preferred_element_type=jnp.float32)
                   + jnp.einsum("bhqk,bhkd->bhqd", probs[..., m:], v_txt,
                                preferred_element_type=jnp.float32)
                   ).astype(q.dtype)
            h = lyr.attention.finish_from_ctx(h, merge_heads(ctx))
            h = lyr.ffn(h)
        # f32 logits: greedy argmax over a 30k vocab at bf16 precision
        # can flip near-tied tokens (repo convention: logits are f32)
        logits = self.output(h)[:, 0].astype(jnp.float32)  # (B, V)
        cache = dict(cache, txt_kv=new_txt_kv, cur_len=cur + 1)
        return logits, cache


def greedy_generate(model: GITForCausalLM, params, input_ids: jax.Array,
                    prompt_len: jax.Array, pixel_values: jax.Array,
                    max_text_len: int = 50,
                    max_new_tokens: Optional[int] = None) -> jax.Array:
    """Greedy decoding to ``max_text_len`` total text tokens per example.

    Replaces the reference's ``model.generate(max_length=50)``
    (modeling.py:333) with the same budget semantics: each example stops
    at [SEP] or when its own text length (prompt + generated) reaches
    ``max_text_len``; finished rows emit pad.  Returns (B, max_new)
    generated token ids.

    jit-able with static output shape; decoding runs in a
    ``lax.while_loop`` that exits as soon as *every* row is finished —
    like HF generate's all-done early stop — so the default
    ``max_new = max_text_len - 1`` budget costs only as many decode
    steps as the longest answer in the batch actually needs.
    """
    eos = model.config.sep_token_id
    pad = model.config.pad_token_id
    if max_new_tokens is None:
        max_new_tokens = max_text_len - 1
    max_new = max_new_tokens
    assert max_new >= 1, max_new

    logits, cache = model.apply(params, input_ids, prompt_len, pixel_values,
                                max_text_len, method=model.prompt_fill)
    first = jnp.argmax(logits, axis=-1)
    over0 = prompt_len >= max_text_len         # no room for any new token
    # batch-padding rows (prompt_len == 0) are born done: their garbage
    # argmax rarely hits EOS and would defeat the all-done early exit,
    # costing the full decode budget on every padded final batch
    done0 = (first == eos) | over0 | (prompt_len == 0)
    tok0 = jnp.where(done0, pad, first)
    buf = jnp.full((input_ids.shape[0], max_new), pad, dtype=tok0.dtype)
    buf = buf.at[:, 0].set(tok0)

    def cond(carry):
        i, _, done, _, _ = carry
        return (i < max_new) & ~jnp.all(done)

    def body(carry):
        i, tok, done, cache, buf = carry
        logits, cache = model.apply(params, tok, cache,
                                    method=model.decode_step)
        nxt = jnp.argmax(logits, axis=-1)
        # position of nxt in the text sequence == updated cur_len
        over = cache["cur_len"] >= max_text_len
        nxt = jnp.where(done | over, pad, nxt)
        done = done | over | (nxt == eos)
        nxt = jnp.where(nxt == eos, pad, nxt)
        buf = buf.at[:, i].set(nxt)
        return (i + 1, nxt, done, cache, buf)

    carry = (jnp.asarray(1, jnp.int32), tok0, done0, cache, buf)
    _, _, _, _, buf = jax.lax.while_loop(cond, body, carry)
    return buf
