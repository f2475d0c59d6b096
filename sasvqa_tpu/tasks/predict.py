"""Single-video question answering — end-to-end inference CLI.

    python -m sasvqa_tpu.tasks.predict --video clip.avi \
        --question "what is the man doing?" \
        --model microsoft/git-base-msrvtt-qa \
        --weights ./pretrained/git-base-msrvtt-qa \
        --tokenizer_dir ./pretrained/tokenizer --nframe 6

Decodes the video through the native shim, uniform-samples ``nframe``
frames, runs the generative GIT path (answer = generated text) or a
classifier checkpoint with an ans2label vocabulary.  The reference has
no equivalent one-shot tool (its eval only runs inside training); this
is the "switch from the reference and find everything" convenience
surface.
"""

from __future__ import annotations

import argparse
from typing import List, Optional

import numpy as np

from sasvqa_tpu.core.logging import LOGGER


def load_frames(video: str, nframe: int, img_size: int) -> np.ndarray:
    """(1, nframe, S, S, 3) normalized frames via uniform centers."""
    from sasvqa_tpu.data.video_decode import VideoDecoder
    from sasvqa_tpu.tools.extract_frames import (_uniform_centers,
                                                 geometry_frames,
                                                 normalize_frames)
    # native-resolution decode in bounded chunks, HF-processor-exact
    # shortest-edge bicubic + center crop per chunk (same pipeline as
    # the stage-A extractor: an out_size decode would squash the aspect
    # ratio, and a whole-video native-res buffer is ~25 GB for a long
    # 1080p clip)
    with VideoDecoder(video) as dec:
        chunks = [geometry_frames(c, img_size) for c in dec.iter_frames()]
    if not chunks:
        raise IOError(f"no frames decoded from {video}")
    frames_u8 = np.concatenate(chunks)
    sel = frames_u8[_uniform_centers(len(frames_u8), nframe)]
    return normalize_frames(sel)[None]


def predict(args) -> str:
    import jax
    import jax.numpy as jnp
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.models.presets import build_model, load_pretrained_params
    from sasvqa_tpu.tasks.run_video_qa import build_tokenizer

    cfg = ConfigDict({
        "model": {"pretrained_model": args.model, "vocab_size": None},
        "img_size": args.img_size, "num_labels": args.num_labels,
        "tokenizer_dir": args.tokenizer_dir,
        # must match the TRAINING run's head ("mlp" is the training
        # argparse default, core/config.py:212) or Orbax snapshot
        # restore fails on the missing/extra cls_fc layer
        "classifier": args.classifier,
    })
    family, model = build_model(cfg, dtype=jnp.bfloat16)
    tokenizer = build_tokenizer(cfg, family)

    def overlay_weights(params):
        """Apply --weights (HF dir) and/or --orbax_ckpt (trained
        ModelSaver snapshot) on freshly initialized params."""
        if args.weights:
            params = load_pretrained_params(family, model, params,
                                            args.weights)
        if args.orbax_ckpt:
            from sasvqa_tpu.core.checkpoint import ModelSaver
            saver = ModelSaver(args.orbax_ckpt)
            step = args.orbax_step if args.orbax_step > 0 \
                else saver.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no eval snapshots under {args.orbax_ckpt}")
            LOGGER.info(f"loading Orbax snapshot model_step_{step}")
            params = saver.restore(int(step), template=params)
        return params

    frames = jnp.asarray(load_frames(args.video, args.nframe,
                                     args.img_size))

    if family == "git":
        from sasvqa_tpu.models.git import greedy_generate
        # truncate the prompt, leaving room to generate (prompt_fill pads
        # the cache to max_length and cannot take a longer prompt)
        budget = max(args.max_length - 8, 1)
        ids_list = ([tokenizer.cls_token_id] + tokenizer.encode(
            args.question, add_special_tokens=False))[:budget]
        lp = len(ids_list)
        ids = jnp.asarray([ids_list], jnp.int32)
        plen = jnp.asarray([lp], jnp.int32)
        params = jax.jit(model.init)(jax.random.key(0), ids,
                                     jnp.ones_like(ids), frames[:, :1])
        params = overlay_weights(params)
        out = greedy_generate(model, params, ids, plen, frames,
                              max_text_len=args.max_length)
        text = tokenizer.decode(np.asarray(out[0]))
        answer = text.split()[-1] if text.split() else ""
        LOGGER.info(f"generated: {text!r}")
        return answer

    # classifier path needs an answer vocabulary
    from sasvqa_tpu.utils.basic import load_json
    assert args.ans2label, "classifier models need --ans2label"
    ans2label = load_json(args.ans2label)
    label2ans = {v: k for k, v in ans2label.items()}
    enc = tokenizer([args.question], max_length=args.max_length)
    ids = jnp.asarray(enc["input_ids"])
    mask = jnp.asarray(enc["attention_mask"])
    params = jax.jit(model.init)(jax.random.key(0), ids, mask, frames)
    params = overlay_weights(params)
    out = jax.jit(lambda p: model.apply(p, ids, mask, frames))(params)
    pred = int(np.asarray(out["logits"]).argmax())
    return label2ans.get(pred, str(pred))


def build_argparser():
    p = argparse.ArgumentParser(description="single-video QA inference")
    p.add_argument("--video", required=True)
    p.add_argument("--question", required=True)
    p.add_argument("--model", default="microsoft/git-base-msrvtt-qa")
    p.add_argument("--weights", default=None,
                   help="local HF checkpoint dir (converted on load)")
    p.add_argument("--orbax_ckpt", default=None,
                   help="a training run's ckpt/ dir (ModelSaver eval "
                        "snapshots); loads --orbax_step or the latest")
    p.add_argument("--orbax_step", type=int, default=-1)
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--ans2label", default=None,
                   help="answer vocab json (classifier models)")
    p.add_argument("--nframe", type=int, default=6)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--num_labels", type=int, default=1000)
    p.add_argument("--classifier", default="mlp",
                   choices=["mlp", "linear"],
                   help="classifier head shape — must match the "
                        "training run (training default: mlp)")
    p.add_argument("--max_length", type=int, default=50)
    return p


def main(argv: Optional[List[str]] = None) -> str:
    args = build_argparser().parse_args(argv)
    answer = predict(args)
    print(f"Q: {args.question}\nA: {answer}")
    return answer


if __name__ == "__main__":
    main()
