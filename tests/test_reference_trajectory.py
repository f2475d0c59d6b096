"""Composed-trajectory parity vs the ACTUAL PyTorch reference loop
(VERDICT r2 missing #2 / next-round #3).

Imports the reference's own modules read-only from /root/reference and
composes them exactly as its hot loop does
(src/tasks/run_video_qa.py:474-511):

    VideoQADataset -> GITVideoQACollator -> MyGitForCausalLM forward
    -> per-micro loss.backward() (gradients SUM over the window, no /K)
    -> torch.optim.AdamW(params, lr) at the accumulation boundary
       (torch defaults: betas (0.9, 0.999), eps 1e-8, uniform
       weight_decay 0.01 — the live loop passes ONLY lr, :416-418)

then replays the IDENTICAL batches through the rebuild's jitted
scan-accumulation train step configured for the reference's exact live
semantics (grad_mean=False, no clipping, no decay masking, constant
LR), starting from converted identical weights.  Per-global-step mean
losses and the final parameters must agree — this retires drift risk in
any composed semantic: collator label masking, GIT image-prefix loss
shift, accumulation boundary, optimizer step math.

Environment shims (import-time only, no behavior touched): the
reference's dead decode path imports ``av`` and its logger imports
``tensorboardX`` — neither is installed, so stub modules satisfy the
imports; its collator constructs a hub AutoProcessor (network) —
patched to the local tokenizer.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


REF = "/root/reference"

# model dims (tiny; CPU)
H, HEADS, LAYERS, FF = 32, 4, 2, 64
IMG, PATCH = 32, 16
STORED_K, STRIDE = 8, 2           # their 'uniform' keeps K//stride = 4
NFRAMES = STORED_K // STRIDE
B, K_ACCUM, N_MICROS = 2, 2, 8
LR = 1e-3


def _import_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    class _AttrDict(dict):
        __getattr__ = dict.__getitem__
        __setattr__ = dict.__setitem__

    for name, attrs in [("av", {}),
                        ("tensorboardX", {"SummaryWriter": object}),
                        ("easydict", {"EasyDict": _AttrDict})]:
        if name not in sys.modules:
            import importlib.machinery
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            # libraries probe optional deps via find_spec(name); a stub
            # without a __spec__ makes that raise instead of answering
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    from src.datasets import dataset_video_qa as ref_data
    from src.modeling import modeling as ref_modeling
    return ref_data, ref_modeling


def _hf_tokenizer(tmp_path):
    """Local BertTokenizer over the test WordPiece vocab (no network)."""
    from transformers import BertTokenizer
    from sasvqa_tpu.data.tokenization import make_test_wordpiece
    tok = make_test_wordpiece()
    by_id = sorted(tok.vocab.items(), key=lambda kv: kv[1])
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(w for w, _ in by_id) + "\n")
    return BertTokenizer(vocab_file=str(vocab_file)), len(by_id)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import torch
    from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                             group_datalist, load_datalist)
    from sasvqa_tpu.data.frame_store import load_vidmapping
    from sasvqa_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("refparity")
    paths = make_synthetic_dataset(str(root / "data"), num_videos=4,
                                   stored_frames=STORED_K, img_hw=IMG,
                                   questions_per_video=2)
    ref_data, ref_modeling = _import_reference()
    hf_tok, vocab_size = _hf_tokenizer(root)

    datalist = load_datalist("msvd_qa", paths["train"])
    grouped = group_datalist(datalist, max_n_example_per_group=1,
                             is_train=True)
    ans2label = build_common_answer_dict((paths["train"],), 1000)
    vid2id = load_vidmapping(paths["vidmapping"])

    ds = ref_data.VideoQADataset(
        task_type="msvd_qa", datalist=grouped, tokenizer=hf_tok,
        img_hdf5_dir=paths["h5"], ans2label=ans2label, vid2id=vid2id,
        return_label=True, is_train=True)

    # their collator builds a hub AutoProcessor for left-padded eval
    # prompts in __init__ (network); train never uses it
    orig = ref_data.AutoProcessor.from_pretrained
    ref_data.AutoProcessor.from_pretrained = staticmethod(
        lambda *a, **k: hf_tok)
    try:
        collator = ref_data.GITVideoQACollator(
            processor=hf_tok, max_length=20, task_type="msvd_qa",
            nframe=STRIDE, samp_policy="uniform", img_size=IMG,
            add_ans=True)
    finally:
        ref_data.AutoProcessor.from_pretrained = orig

    # deterministic batch stream, cycled like InfiniteIterator over an
    # unshuffled DataLoader
    base = [collator.collate_batch([ds[i] for i in idx])
            for idx in (range(0, 2), range(2, 4))]
    batches = [base[i % len(base)] for i in range(N_MICROS)]

    from transformers import GitConfig, GitVisionConfig
    vision = GitVisionConfig(hidden_size=H, intermediate_size=FF,
                             num_hidden_layers=LAYERS,
                             num_attention_heads=HEADS,
                             image_size=IMG, patch_size=PATCH)
    git_cfg = GitConfig(vocab_size=vocab_size, hidden_size=H,
                        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
                        intermediate_size=FF, max_position_embeddings=64,
                        vision_config=vision.to_dict(),
                        num_image_with_embedding=NFRAMES,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = ref_modeling.MyGitForCausalLM(git_cfg)
    model.train()
    return model, git_cfg, batches, vocab_size


def _run_reference(model, batches):
    """The live loop's exact optimizer composition (:416-418, :474-511):
    plain AdamW(lr) over all params, grads summed across the window."""
    import copy
    import torch
    model = copy.deepcopy(model)
    opt = torch.optim.AdamW([p for p in model.parameters()
                             if p.requires_grad], lr=LR)
    losses = []
    opt.zero_grad()
    for step, batch in enumerate(batches):
        out = model(input_ids=batch["text_input_ids"],
                    attention_mask=batch["text_attention_mask"],
                    pixel_values=batch["visual_inputs"].float(),
                    labels=batch["labels"])
        loss = out.loss.mean()
        loss.backward()
        losses.append(float(loss.item()))
        if (step + 1) % K_ACCUM == 0:
            opt.step()
            opt.zero_grad()
    return losses, model.state_dict()


def _to_ours(batch):
    """reference batch dict -> rebuild batch dict (NCHW -> NHWC)."""
    return {
        "text_input_ids": batch["text_input_ids"].numpy().astype(np.int32),
        "text_attention_mask":
            batch["text_attention_mask"].numpy().astype(np.int32),
        "labels": batch["labels"].numpy().astype(np.int32),
        "visual_inputs": batch["visual_inputs"].float().numpy()
            .transpose(0, 1, 3, 4, 2).astype(np.float32),
    }


def _fx_model(vocab_size):
    from sasvqa_tpu.models.clip import CLIPVisionConfig as FxV
    from sasvqa_tpu.models.git import GITConfig, GITForCausalLM
    # dropout 0 on both sides: cross-framework rng streams can't match,
    # so determinism comes from disabling the only stochastic op
    cfg = GITConfig(
        vocab_size=vocab_size, hidden_size=H, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=FF, max_position_embeddings=64,
        sep_token_id=3, dropout=0.0, attention_dropout=0.0,
        vision=FxV(hidden_size=H, intermediate_size=FF, num_layers=LAYERS,
                   num_heads=HEADS, image_size=IMG, patch_size=PATCH))
    return GITForCausalLM(cfg)   # dtype f32 to match the torch side


def _run_rebuild(state_dict, batches, vocab_size):
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.data.pipeline import stack_microbatches
    from sasvqa_tpu.models.convert import convert_git
    from sasvqa_tpu.train import steps as ts

    fx = _fx_model(vocab_size)
    params = {"params": convert_git(state_dict, LAYERS, LAYERS)}
    # the live reference optimizer: AdamW(lr) only — torch defaults
    # betas (0.9, 0.999), eps 1e-8, weight_decay 0.01 on ALL params
    # (params=None skips the rebuild's decay masking), no clipping,
    # constant LR, grads SUMMED over the window
    cfg = ConfigDict(optim="adamw", learning_rate=LR, decay="constant",
                     weight_decay=0.01, grad_norm=-1, num_train_epochs=1,
                     gradient_accumulation_steps=K_ACCUM, scan_accum=1,
                     accum_grad_mean=0, betas=[0.9, 0.999])
    tx = ts.make_optimizer(cfg, total_steps=100, params=None)
    state = ts.TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params), tx=tx,
                          apply_fn=fx.apply)
    step_fn = ts.make_scan_train_step(K_ACCUM, "git", grad_mean=False)
    losses = []
    for sb in stack_microbatches(iter(map(_to_ours, batches)), K_ACCUM):
        state, metrics = step_fn(state, sb, jax.random.key(0))
        losses.append(float(metrics["loss"]))
    return losses, state.params


def test_reference_loop_trajectory_parity(setup):
    model, git_cfg, batches, vocab_size = setup
    ref_losses, ref_final = _run_reference(model, batches)
    our_losses, our_final = _run_rebuild(
        {k: v.clone() for k, v in model.state_dict().items()},
        batches, vocab_size)

    # per-global-step mean loss (the scan step reports the window mean)
    ref_means = [float(np.mean(ref_losses[i:i + K_ACCUM]))
                 for i in range(0, N_MICROS, K_ACCUM)]
    assert len(our_losses) == len(ref_means) == N_MICROS // K_ACCUM
    np.testing.assert_allclose(our_losses, ref_means, rtol=2e-4,
                               atol=2e-5)

    # final params agree after 4 optimizer steps
    from sasvqa_tpu.models.convert import convert_git
    ref_final_fx = {"params": convert_git(ref_final, LAYERS, LAYERS)}
    flat_ref = jax.tree_util.tree_leaves(ref_final_fx)
    flat_our = jax.tree_util.tree_leaves(our_final)
    assert len(flat_ref) == len(flat_our)
    for a, b in zip(flat_ref, flat_our):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)


# ---------------------------------------------------------------------------
# classifier family (VERDICT r3 item 3): the same composed-trajectory
# proof for the CLIP classification path — reference VideoQACollator ->
# CLIPModelforFinetune(CLIPForSeqClassification) -> CE(ignore -100) ->
# torch AdamW(lr) + MultiStepLR — vs the rebuild's classifier scan step
# from a FULL converted state dict (towers + fusion head + classifier).


NUM_LABELS = 8


@pytest.fixture(scope="module")
def clip_setup(tmp_path_factory):
    import torch
    from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                             group_datalist, load_datalist)
    from sasvqa_tpu.data.frame_store import load_vidmapping
    from sasvqa_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("refparity_clip")
    paths = make_synthetic_dataset(str(root / "data"), num_videos=4,
                                   stored_frames=STORED_K, img_hw=IMG,
                                   questions_per_video=2)
    ref_data, ref_modeling = _import_reference()
    import src.modeling.clip_model as ref_clip_model
    hf_tok, vocab_size = _hf_tokenizer(root)

    datalist = load_datalist("msvd_qa", paths["train"])
    grouped = group_datalist(datalist, max_n_example_per_group=1,
                             is_train=True)
    ans2label = build_common_answer_dict((paths["train"],), 1000)
    assert len(ans2label) <= NUM_LABELS
    vid2id = load_vidmapping(paths["vidmapping"])

    ds = ref_data.VideoQADataset(
        task_type="msvd_qa", datalist=grouped, tokenizer=hf_tok,
        img_hdf5_dir=paths["h5"], ans2label=ans2label, vid2id=vid2id,
        return_label=True, is_train=True)
    collator = ref_data.VideoQACollator(
        tokenizer=hf_tok, max_length=20, task_type="msvd_qa",
        nframe=STRIDE, samp_policy="uniform", img_size=IMG)
    base = [collator.collate_batch([ds[i] for i in idx])
            for idx in (range(0, 2), range(2, 4))]
    batches = [base[i % len(base)] for i in range(N_MICROS)]

    # tiny HF towers from config objects — CLIPBaseModel hub loads
    # (modeling.py:286-287) patched to return them
    from transformers import (CLIPTextConfig, CLIPTextModel,
                              CLIPVisionConfig, CLIPVisionModelWithProjection)
    tcfg = CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=H, intermediate_size=FF,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=32, projection_dim=H, attention_dropout=0.0)
    vcfg = CLIPVisionConfig(
        hidden_size=H, intermediate_size=FF, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, image_size=IMG, patch_size=PATCH,
        projection_dim=H, attention_dropout=0.0)
    torch.manual_seed(0)
    txt = CLIPTextModel(tcfg)
    vis = CLIPVisionModelWithProjection(vcfg)

    class _FakeHub:
        def __init__(self, model):
            self.model = model

        def from_pretrained(self, *a, **k):
            return self.model

    cfg = types.SimpleNamespace(
        pretrained_model="tiny-clip", num_labels=NUM_LABELS,
        loss_type="ce", hidden_dropout_prob=0.0, txt_output_size=H)
    saved = (ref_modeling.CLIPTextModel,
             ref_modeling.CLIPVisionModelWithProjection)
    ref_modeling.CLIPTextModel = _FakeHub(txt)
    ref_modeling.CLIPVisionModelWithProjection = _FakeHub(vis)
    try:
        torch.manual_seed(1)   # fusion head + classifier init
        model = ref_clip_model.CLIPModelforFinetune(cfg)
    finally:
        (ref_modeling.CLIPTextModel,
         ref_modeling.CLIPVisionModelWithProjection) = saved
    # cross-framework rng streams can't match — determinism comes from
    # zeroing every dropout (the head hardcodes p=0.1, modeling.py:368).
    # nn.MultiheadAttention keeps its attention dropout as a FLOAT
    # attribute (not an nn.Dropout module), so zero it separately.
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        elif isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
    model.train()
    return model, batches, vocab_size


def _run_reference_clip(model, batches):
    """The live classifier loop's exact composition
    (run_video_qa.py:416-422, 474-511 + the MultiStepLR wiring): plain
    AdamW(lr) over all params, grads SUMMED across the window, scheduler
    stepped per global step with global-step milestones (the rebuild's
    documented divergence from the step-inside-valid-block quirk,
    train/schedules.py multi_step)."""
    import copy
    import torch
    from torch.optim.lr_scheduler import MultiStepLR
    model = copy.deepcopy(model)
    opt = torch.optim.AdamW([p for p in model.parameters()
                             if p.requires_grad], lr=LR)
    sched = MultiStepLR(opt, milestones=[2], gamma=0.5)
    losses = []
    opt.zero_grad()
    for step, batch in enumerate(batches):
        out = model({k: v for k, v in batch.items()
                     if k != "question_ids"})
        loss = out["loss"].mean()
        loss.backward()
        losses.append(float(loss.item()))
        if (step + 1) % K_ACCUM == 0:
            opt.step()
            sched.step()
            opt.zero_grad()
    return losses, model.VLModel.state_dict()


def _to_ours_clip(batch):
    """reference classifier batch -> rebuild batch (B*T NCHW -> B,T NHWC)."""
    vis = batch["visual_inputs"].float().numpy()    # (B*T, 3, H, W)
    b = len(batch["video_start_end"]) - 1
    t = vis.shape[0] // b
    return {
        "text_input_ids": batch["text_input_ids"].numpy().astype(np.int32),
        "text_attention_mask":
            batch["text_attention_mask"].numpy().astype(np.int32),
        "labels": batch["labels"].numpy().astype(np.int32),
        "visual_inputs": vis.reshape(b, t, 3, IMG, IMG)
            .transpose(0, 1, 3, 4, 2).astype(np.float32),
    }


def _fx_clip_model(vocab_size):
    from sasvqa_tpu.models.clip import (CLIPTextConfig as FxT,
                                        CLIPVisionConfig as FxV)
    from sasvqa_tpu.models.video_qa import (ClassifierHeadConfig,
                                            CLIPVideoQA)
    tc = FxT(vocab_size=vocab_size, hidden_size=H, intermediate_size=FF,
             num_layers=LAYERS, num_heads=HEADS,
             max_position_embeddings=32)
    vc = FxV(hidden_size=H, intermediate_size=FF, num_layers=LAYERS,
             num_heads=HEADS, image_size=IMG, patch_size=PATCH,
             projection_dim=H)
    head = ClassifierHeadConfig(num_labels=NUM_LABELS, loss_type="ce",
                                hidden_dropout_prob=0.0)
    return CLIPVideoQA(tc, vc, head)


def _run_rebuild_clip(state_dict, batches, vocab_size):
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.data.pipeline import stack_microbatches
    from sasvqa_tpu.models.convert import (convert_clip_classifier,
                                           merge_pretrained)
    from sasvqa_tpu.train import steps as ts

    fx = _fx_clip_model(vocab_size)
    first = _to_ours_clip(batches[0])
    init = fx.init(jax.random.key(0), first["text_input_ids"],
                   first["text_attention_mask"], first["visual_inputs"])
    converted = convert_clip_classifier(state_dict, LAYERS, LAYERS)
    params, report = merge_pretrained(init["params"], converted)
    assert not report["mismatched"], report["mismatched"]
    # everything the torch model trains must have been converted (only
    # the unused mc_head may stay at init)
    assert all(p.startswith("/mc_head") for p in report["missing_in_ckpt"]
               ), report["missing_in_ckpt"]
    params = {"params": params}

    # the live classifier composition: AdamW(lr) torch defaults (betas
    # (0.9, 0.999), eps 1e-8, uniform wd 0.01 -> params=None skips decay
    # masking), MultiStepLR milestone at global step 2, no clipping,
    # grads SUMMED over the window
    cfg = ConfigDict(optim="adamw", learning_rate=LR, decay="multi_step",
                     step_decay_epochs=[1], num_train_epochs=2, gamma=0.5,
                     weight_decay=0.01, grad_norm=-1,
                     gradient_accumulation_steps=K_ACCUM, scan_accum=1,
                     accum_grad_mean=0, betas=[0.9, 0.999])
    tx = ts.make_optimizer(cfg, total_steps=N_MICROS // K_ACCUM,
                           params=None)
    state = ts.TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params), tx=tx,
                          apply_fn=fx.apply)
    step_fn = ts.make_scan_train_step(K_ACCUM, "classifier",
                                      grad_mean=False)
    losses = []
    for sb in stack_microbatches(iter(map(_to_ours_clip, batches)),
                                 K_ACCUM):
        state, metrics = step_fn(state, sb, jax.random.key(0))
        losses.append(float(metrics["loss"]))
    return losses, state.params


def test_reference_classifier_trajectory_parity(clip_setup):
    model, batches, vocab_size = clip_setup
    ref_losses, ref_final = _run_reference_clip(model, batches)
    our_losses, our_final = _run_rebuild_clip(
        {k: v.clone() for k, v in model.VLModel.state_dict().items()},
        batches, vocab_size)

    ref_means = [float(np.mean(ref_losses[i:i + K_ACCUM]))
                 for i in range(0, N_MICROS, K_ACCUM)]
    assert len(our_losses) == len(ref_means) == N_MICROS // K_ACCUM
    np.testing.assert_allclose(our_losses, ref_means, rtol=2e-4,
                               atol=2e-5)

    # final params agree after 4 optimizer steps (milestone halved the
    # LR for steps 3-4 on both sides)
    from flax.traverse_util import flatten_dict
    from sasvqa_tpu.models.convert import convert_clip_classifier

    def jax_flat(tree):
        return {"/".join(k): np.asarray(v)
                for k, v in flatten_dict(tree).items()}

    ref_fx = convert_clip_classifier(ref_final, LAYERS, LAYERS)
    flat_ref = jax_flat(ref_fx)
    flat_our = jax_flat(our_final["params"])
    assert set(flat_ref) <= set(flat_our)
    for k in flat_ref:
        ours, ref = flat_our[k], flat_ref[k]
        # every K-projection bias is a GAUGE direction: it adds the same
        # constant to every score in a softmax row, so the model output
        # is exactly invariant to it and its true gradient is zero.
        # Both frameworks integrate pure fp round-off noise through
        # Adam (update ~ lr * noise/sqrt(noise^2 + eps)) and drift
        # independently — skip K biases (the K third of fused qkv).
        if k.endswith("k_proj/bias"):
            continue
        if k.endswith("self_attn/qkv/bias"):
            d = len(ref) // 3
            ours = np.concatenate([ours[:d], ours[2 * d:]])
            ref = np.concatenate([ref[:d], ref[2 * d:]])
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=2e-5,
                                   err_msg=k)


def test_reference_classifier_collator_parity(clip_setup):
    """Our ClassifierCollator reproduces the reference VideoQACollator's
    arrays on the same items (valid region; ours pads to a fixed
    bucket, theirs to the batch longest)."""
    model, batches, vocab_size = clip_setup
    ref_batch = batches[0]
    ref_ids = ref_batch["text_input_ids"].numpy()
    Lr = ref_ids.shape[1]

    import tempfile

    import sasvqa_tpu.data.dataset as dd
    from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                             group_datalist, load_datalist)
    from sasvqa_tpu.data.frame_store import (FrameStoreReader,
                                             load_vidmapping)
    from sasvqa_tpu.data.synthetic import make_synthetic_dataset
    from sasvqa_tpu.data.tokenization import make_test_wordpiece

    with tempfile.TemporaryDirectory() as td:
        paths = make_synthetic_dataset(td + "/data", num_videos=4,
                                       stored_frames=STORED_K, img_hw=IMG,
                                       questions_per_video=2)
        datalist = load_datalist("msvd_qa", paths["train"])
        grouped = group_datalist(datalist, max_n_example_per_group=1,
                                 is_train=True)
        ans2label = build_common_answer_dict((paths["train"],), 1000)
        ds = dd.VideoQADataset("msvd_qa", grouped,
                               FrameStoreReader(paths["h5"]),
                               load_vidmapping(paths["vidmapping"]),
                               ans2label, return_label=True, is_train=True)
        col = dd.ClassifierCollator(make_test_wordpiece(), max_txt_len=20,
                                    task_type="msvd_qa", nframe=STRIDE,
                                    samp_policy="uniform")
        ours = col([ds.get_group(0), ds.get_group(1)],
                   rng=np.random.default_rng(0))

    assert ours["text_input_ids"].shape[1] >= Lr
    np.testing.assert_array_equal(ours["text_input_ids"][:, :Lr], ref_ids)
    np.testing.assert_array_equal(
        ours["text_attention_mask"][:, :Lr],
        ref_batch["text_attention_mask"].numpy())
    assert (ours["text_attention_mask"][:, Lr:] == 0).all()
    np.testing.assert_array_equal(ours["labels"],
                                  ref_batch["labels"].numpy())
    ref_vis = ref_batch["visual_inputs"].float().numpy()
    b = len(ref_batch["video_start_end"]) - 1
    t = ref_vis.shape[0] // b
    np.testing.assert_allclose(
        ours["visual_inputs"],
        ref_vis.reshape(b, t, 3, IMG, IMG).transpose(0, 1, 3, 4, 2),
        rtol=1e-6, atol=1e-6)


def test_reference_collator_vs_rebuild_collator(setup):
    """Our GITCollator reproduces the reference GITVideoQACollator's
    arrays on the same items (valid region; ours pads to a fixed
    bucket, theirs to the batch longest)."""
    model, git_cfg, batches, vocab_size = setup
    ref_batch = batches[0]
    ref_ids = ref_batch["text_input_ids"].numpy()
    ref_mask = ref_batch["text_attention_mask"].numpy()
    ref_labels = ref_batch["labels"].numpy()
    Lr = ref_ids.shape[1]

    from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                             group_datalist, load_datalist)
    # rebuild side: same items through our dataset/collator
    # (fixture state lives in the reference dataset; rebuild mirrors it)
    # -> reuse the reference dataset's datalist via our own classes
    import sasvqa_tpu.data.dataset as dd
    from sasvqa_tpu.data.frame_store import (FrameStoreReader,
                                             load_vidmapping)
    from sasvqa_tpu.data.tokenization import make_test_wordpiece

    # the synthetic fixture paths are recoverable from the reference ds
    # via the batches' provenance; simplest is to rebuild from scratch
    # with the same seed/layout
    from sasvqa_tpu.data.synthetic import make_synthetic_dataset
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        paths = make_synthetic_dataset(td + "/data", num_videos=4,
                                       stored_frames=STORED_K, img_hw=IMG,
                                       questions_per_video=2)
        datalist = load_datalist("msvd_qa", paths["train"])
        grouped = group_datalist(datalist, max_n_example_per_group=1,
                                 is_train=True)
        ans2label = build_common_answer_dict((paths["train"],), 1000)
        ds = dd.VideoQADataset("msvd_qa", grouped,
                               FrameStoreReader(paths["h5"]),
                               load_vidmapping(paths["vidmapping"]),
                               ans2label, return_label=True, is_train=True)
        col = dd.GITCollator(make_test_wordpiece(), max_txt_len=20,
                             max_seq_len=24, task_type="msvd_qa",
                             nframe=STRIDE, samp_policy="uniform",
                             add_ans=True)
        ours = col([ds.get_group(0), ds.get_group(1)],
                   rng=np.random.default_rng(0))

    assert ours["text_input_ids"].shape[1] >= Lr
    np.testing.assert_array_equal(ours["text_input_ids"][:, :Lr], ref_ids)
    np.testing.assert_array_equal(ours["text_attention_mask"][:, :Lr],
                                  ref_mask)
    # past the reference's longest everything is padding on our side
    assert (ours["text_attention_mask"][:, Lr:] == 0).all()
    # label masking parity on supervised (non-pad) positions
    sup = ref_mask == 1
    np.testing.assert_array_equal(ours["labels"][:, :Lr][sup],
                                  ref_labels[sup])
    # frames: same uniform-stride selection, NHWC vs NCHW
    ref_vis = ref_batch["visual_inputs"].float().numpy()
    np.testing.assert_allclose(
        ours["visual_inputs"],
        ref_vis.transpose(0, 1, 3, 4, 2), rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# BLIP family: the same composed-trajectory proof for the third model
# family — reference BLIPVideoQACollator -> CLIPModelforFinetune with
# BLIPBaseModel (BlipVision + cross-attending BlipText,
# modeling.py:299-315) -> CLIPForSeqClassification fusion/classifier ->
# CE -> torch AdamW + MultiStepLR — vs the rebuild's BLIPVideoQA scan
# step from a FULL converted state dict (convert_blip_classifier).
# nframe=1 'single' policy: the reference BLIP path only supports T=1
# (dataset_video_qa.py:280 "FIXME: only impl single here").


@pytest.fixture(scope="module")
def blip_setup(tmp_path_factory):
    import torch
    from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                             group_datalist, load_datalist)
    from sasvqa_tpu.data.frame_store import load_vidmapping
    from sasvqa_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("refparity_blip")
    paths = make_synthetic_dataset(str(root / "data"), num_videos=4,
                                   stored_frames=STORED_K, img_hw=IMG,
                                   questions_per_video=2)
    ref_data, ref_modeling = _import_reference()
    import src.modeling.clip_model as ref_clip_model
    hf_tok, vocab_size = _hf_tokenizer(root)

    datalist = load_datalist("msvd_qa", paths["train"])
    grouped = group_datalist(datalist, max_n_example_per_group=1,
                             is_train=True)
    ans2label = build_common_answer_dict((paths["train"],), 1000)
    assert len(ans2label) <= NUM_LABELS
    vid2id = load_vidmapping(paths["vidmapping"])

    ds = ref_data.VideoQADataset(
        task_type="msvd_qa", datalist=grouped, tokenizer=hf_tok,
        img_hdf5_dir=paths["h5"], ans2label=ans2label, vid2id=vid2id,
        return_label=True, is_train=True)
    collator = ref_data.BLIPVideoQACollator(
        processor=hf_tok, max_length=20, task_type="msvd_qa",
        nframe=1, samp_policy="single", img_size=IMG)
    base = [collator.collate_batch([ds[i] for i in idx])
            for idx in (range(0, 2), range(2, 4))]
    batches = [base[i % len(base)] for i in range(N_MICROS)]

    # tiny HF towers from config objects — BLIPBaseModel hub loads
    # (modeling.py:303-304) patched to return them.  is_decoder=True
    # only GATES the crossattention modules' existence in HF
    # BlipTextLayer; causality is forward()'s own is_decoder flag,
    # which the reference never passes (modeling.py:307-315)
    from transformers import BlipTextConfig, BlipVisionConfig
    from transformers.models.blip.modeling_blip import BlipVisionModel
    from transformers.models.blip.modeling_blip_text import BlipTextModel
    vcfg = BlipVisionConfig(
        hidden_size=H, intermediate_size=FF, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, image_size=IMG, patch_size=PATCH,
        attention_dropout=0.0)
    tcfg = BlipTextConfig(
        vocab_size=vocab_size, hidden_size=H, intermediate_size=FF,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=32, encoder_hidden_size=H,
        is_decoder=True, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    vis = BlipVisionModel(vcfg)
    txt = BlipTextModel(tcfg, add_pooling_layer=True)

    class _FakeHub:
        def __init__(self, model):
            self.model = model

        def from_pretrained(self, *a, **k):
            return self.model

    cfg = types.SimpleNamespace(
        pretrained_model="tiny-blip", num_labels=NUM_LABELS,
        loss_type="ce", hidden_dropout_prob=0.0, txt_output_size=H)
    saved = (ref_modeling.BlipVisionModel, ref_modeling.BlipTextModel)
    ref_modeling.BlipVisionModel = _FakeHub(vis)
    ref_modeling.BlipTextModel = _FakeHub(txt)
    try:
        torch.manual_seed(1)   # fusion head + classifier init
        model = ref_clip_model.CLIPModelforFinetune(cfg)
    finally:
        (ref_modeling.BlipVisionModel,
         ref_modeling.BlipTextModel) = saved
    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        elif isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
    model.train()
    return model, batches, vocab_size


def _fx_blip_model(vocab_size):
    from sasvqa_tpu.models.blip import (BLIPTextConfig as FxT,
                                        BLIPVisionConfig as FxV)
    from sasvqa_tpu.models.video_qa import (BLIPVideoQA,
                                            ClassifierHeadConfig)
    tc = FxT(vocab_size=vocab_size, hidden_size=H, intermediate_size=FF,
             num_layers=LAYERS, num_heads=HEADS,
             max_position_embeddings=32, encoder_width=H)
    vc = FxV(hidden_size=H, intermediate_size=FF, num_layers=LAYERS,
             num_heads=HEADS, image_size=IMG, patch_size=PATCH)
    head = ClassifierHeadConfig(num_labels=NUM_LABELS, loss_type="ce",
                                hidden_dropout_prob=0.0)
    return BLIPVideoQA(tc, vc, head)


def _run_rebuild_blip(state_dict, batches, vocab_size):
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.data.pipeline import stack_microbatches
    from sasvqa_tpu.models.convert import (convert_blip_classifier,
                                           merge_pretrained)
    from sasvqa_tpu.train import steps as ts

    fx = _fx_blip_model(vocab_size)
    first = _to_ours_clip(batches[0])
    init = fx.init(jax.random.key(0), first["text_input_ids"],
                   first["text_attention_mask"], first["visual_inputs"])
    converted = convert_blip_classifier(state_dict, LAYERS, LAYERS)
    params, report = merge_pretrained(init["params"], converted)
    assert not report["mismatched"], report["mismatched"]
    assert all(p.startswith("/mc_head") for p in report["missing_in_ckpt"]
               ), report["missing_in_ckpt"]
    params = {"params": params}

    cfg = ConfigDict(optim="adamw", learning_rate=LR, decay="multi_step",
                     step_decay_epochs=[1], num_train_epochs=2, gamma=0.5,
                     weight_decay=0.01, grad_norm=-1,
                     gradient_accumulation_steps=K_ACCUM, scan_accum=1,
                     accum_grad_mean=0, betas=[0.9, 0.999])
    tx = ts.make_optimizer(cfg, total_steps=N_MICROS // K_ACCUM,
                           params=None)
    state = ts.TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params), tx=tx,
                          apply_fn=fx.apply)
    step_fn = ts.make_scan_train_step(K_ACCUM, "classifier",
                                      grad_mean=False)
    losses = []
    for sb in stack_microbatches(iter(map(_to_ours_clip, batches)),
                                 K_ACCUM):
        state, metrics = step_fn(state, sb, jax.random.key(0))
        losses.append(float(metrics["loss"]))
    return losses, state.params


def test_reference_blip_trajectory_parity(blip_setup):
    model, batches, vocab_size = blip_setup
    ref_losses, ref_final = _run_reference_clip(model, batches)
    our_losses, our_final = _run_rebuild_blip(
        {k: v.clone() for k, v in model.VLModel.state_dict().items()},
        batches, vocab_size)

    ref_means = [float(np.mean(ref_losses[i:i + K_ACCUM]))
                 for i in range(0, N_MICROS, K_ACCUM)]
    assert len(our_losses) == len(ref_means) == N_MICROS // K_ACCUM
    np.testing.assert_allclose(our_losses, ref_means, rtol=2e-4,
                               atol=2e-5)

    from flax.traverse_util import flatten_dict
    from sasvqa_tpu.models.convert import convert_blip_classifier

    def jax_flat(tree):
        return {"/".join(k): np.asarray(v)
                for k, v in flatten_dict(tree).items()}

    ref_fx = convert_blip_classifier(ref_final, LAYERS, LAYERS)
    flat_ref = jax_flat(ref_fx)
    flat_our = jax_flat(our_final["params"])
    assert set(flat_ref) <= set(flat_our)
    skipped = []
    for k in flat_ref:
        # Gauge directions — leaves whose gradient is EXACTLY zero in
        # exact arithmetic, so both optimizers integrate pure numerical
        # noise there (diagnosed r5; /tmp-reproducible via the grad
        # probe below):
        # (a) K-projection biases under softmax (see the CLIP test);
        # (b) the fusion head's cross_attn q/k ENTIRELY: this test runs
        #     the reference BLIP path's only supported shape nframe=1
        #     ('single' policy), so cross-attention sees ONE kv token,
        #     softmax == 1 identically, and the whole QK pathway is
        #     invisible to the loss.  JAX autodiff yields exact 0.0
        #     grads (the trajectory is pure weight decay — verified
        #     against the closed-form (1-lr*wd)^t prediction to all
        #     printed digits), while torch's fused-MHA backward leaves
        #     ~1e-6 f32 residuals that AdamW's per-element
        #     normalization amplifies into an O(lr) random walk
        #     (measured d/upd ~= 1.0 on exactly these leaves across 4
        #     seeds, everywhere else <= 2%).
        if (k.endswith("key/bias") or k.endswith("k_proj/bias")
                or "cross_attn/q_proj" in k or "cross_attn/k_proj" in k):
            skipped.append(k)
            continue
        # atol: measured op-order noise on non-gauge leaves is
        # <= 2.9e-5 at 8 micros (worst leaf vis fc2, 1.8% of its own
        # update) and does NOT grow with trajectory length (2.8e-5 at
        # 16 micros = 0.68% of update) — 1e-4 gives a 3.4x margin
        np.testing.assert_allclose(flat_our[k], flat_ref[k], rtol=5e-3,
                                   atol=1e-4, err_msg=k)
    # the skip list must stay exactly the documented gauge set — it
    # cannot silently grow to hollow the test out
    assert all(k.endswith(("key/bias", "k_proj/bias"))
               or "cross_attn/q_proj" in k or "cross_attn/k_proj" in k
               for k in skipped)
    assert sum("cross_attn" in k for k in skipped) == 4  # q/k kernel+bias
