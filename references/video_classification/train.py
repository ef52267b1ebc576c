"""Video-classification training CLI (reference
``references/video_classification/train.py``: clip-level training on
Kinetics, clip accuracy + video-level accuracy by averaging clip
softmaxes).

Example (smoke run on fake data):
    python references/video_classification/train.py --model r3d_18 \
        --fake-data --epochs 1 --batch-size 2 --steps-per-epoch 2 \
        --clip-len 4 --size 64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "classification"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import utils
from vision_tpu.models import get_model
from vision_tpu.parallel import make_mesh, replicate, shard_batch
from vision_tpu.parallel.train import TrainState


class VideoAccuracy:
    """Video-level accuracy (reference ``train.py`` evaluate): average the
    clip softmaxes per video id, then argmax."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.scores = {}
        self.labels = {}

    def update(self, video_ids, probs, labels):
        for vid, p, y in zip(
            np.asarray(video_ids), np.asarray(probs), np.asarray(labels)
        ):
            vid = int(vid)
            self.scores[vid] = self.scores.get(vid, 0) + p
            self.labels[vid] = int(y)

    def compute(self) -> float:
        if not self.scores:
            return 0.0
        correct = sum(
            int(np.argmax(p) == self.labels[v]) for v, p in self.scores.items()
        )
        return correct / len(self.scores)


def _kinetics_batches(args, split="train", seed=0):
    """Real-data path over vision_tpu.datasets.Kinetics +
    RandomClipSampler (requires a video backend: pyav). Clips go through
    presets.VideoClassificationPreset{Train,Eval} (Kinetics recipe:
    short-side resize, hflip, normalize, crop)."""
    import importlib.util

    from vision_tpu.datasets import Kinetics, RandomClipSampler

    spec = importlib.util.spec_from_file_location(
        "_video_presets",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "presets.py"),
    )
    vp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vp)
    resize_size = int(round(args.size * 8 / 7))  # 224 -> 256 ratio
    preset = (
        vp.VideoClassificationPresetTrain(
            crop_size=args.size, resize_size=resize_size
        )
        if split == "train"
        else vp.VideoClassificationPresetEval(
            crop_size=args.size, resize_size=resize_size
        )
    )

    ds = Kinetics(
        args.data_path, frames_per_clip=args.clip_len, split=split,
        step_between_clips=args.clip_len,
    )
    sampler = RandomClipSampler(ds.video_clips, max_clips_per_video=5)
    rng = np.random.RandomState(seed)
    vids, labels, ids = [], [], []
    for clip_idx in iter(sampler):
        video, _audio, label = ds[int(clip_idx)]
        video = preset(np.asarray(video), rng)
        vids.append(video)
        labels.append(label)
        ids.append(ds.video_clips.get_clip_location(int(clip_idx))[0])
        if len(vids) == args.batch_size:
            yield {
                "video": np.stack(vids),
                "label": np.asarray(labels, np.int32),
                "video_id": np.asarray(ids),
            }
            vids, labels, ids = [], [], []


def _fake_batches(args, num_classes, steps, seed=0):
    rng = np.random.RandomState(seed)
    for i in range(steps):
        yield {
            "video": rng.rand(
                args.batch_size, args.clip_len, args.size, args.size, 3
            ).astype(np.float32),
            "label": rng.randint(0, num_classes, args.batch_size).astype(np.int32),
            "video_id": np.arange(args.batch_size) + i * args.batch_size,
        }


def main(args):
    print(args)
    num_classes = args.num_classes
    if args.weights:
        model = get_model(args.model, weights=args.weights)
    else:
        model = get_model(args.model, num_classes=num_classes)
    module = model.module
    variables = dict(model.variables)
    params = variables.pop("params")
    batch_stats = variables.pop("batch_stats", {})

    # reference: MultiStepLR(milestones, gamma) + linear warmup epochs
    spe = args.steps_per_epoch or 100
    sched = optax.piecewise_constant_schedule(
        args.lr, {m * spe: args.lr_gamma for m in args.lr_milestones}
    )
    if args.lr_warmup_epochs > 0:
        warm = optax.linear_schedule(
            args.lr * args.lr_warmup_decay, args.lr,
            args.lr_warmup_epochs * spe,
        )
        sched = optax.join_schedules(
            [warm, sched], [args.lr_warmup_epochs * spe]
        )
    tx = optax.sgd(sched, momentum=args.momentum)
    if args.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(args.weight_decay), tx)
    state = TrainState(
        params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), step=jnp.zeros((), jnp.int32),
    )
    mesh = make_mesh()
    state = replicate(state, mesh)
    base_key = jax.random.PRNGKey(args.seed)

    def amp_cast(tree):
        # --amp: bf16 compute, f32 master state (reference --amp,
        # video_classification/train.py:439)
        if not args.amp:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    @jax.jit
    def train_step(state, batch):
        step_key = jax.random.fold_in(base_key, state.step)

        def loss_fn(p):
            varz = {"params": amp_cast(p)}
            video = amp_cast(batch["video"])
            if state.batch_stats:
                # f32 carry: casting would re-quantize the running
                # averages every step (torch AMP keeps BN state f32)
                varz["batch_stats"] = state.batch_stats
                logits, mutated = module.apply(
                    varz, video, train=True, mutable=["batch_stats"],
                    rngs={"dropout": step_key},
                )
                bs = jax.tree_util.tree_map(
                    lambda n, o: n.astype(o.dtype),
                    mutated["batch_stats"],
                    state.batch_stats,
                )
            else:
                logits = module.apply(
                    varz, video, train=True,
                    rngs={"dropout": step_key},
                )
                bs = state.batch_stats
            logits = logits.astype(jnp.float32)
            one_hot = jax.nn.one_hot(batch["label"], num_classes)
            loss = -jnp.mean(
                jnp.sum(one_hot * jax.nn.log_softmax(logits), axis=-1)
            )
            return loss, bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_bs, opt_state=opt_state, step=state.step + 1,
            ),
            loss,
        )

    @jax.jit
    def eval_step(state, batch):
        varz = {"params": state.params}
        if state.batch_stats:
            varz["batch_stats"] = state.batch_stats
        logits = module.apply(varz, batch["video"], train=False)
        return jax.nn.softmax(logits)

    start_epoch = args.start_epoch
    if args.resume:
        # optimizer state (momentum + warmup step count) resumes too;
        # older checkpoints without it fall back to fresh opt_state.
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "epoch": 0,
        }
        has_opt = "opt_state" in utils.checkpoint_keys(args.resume)
        if has_opt:
            template["opt_state"] = state.opt_state
            template["step"] = state.step
        restored = utils.load_checkpoint(args.resume, template)
        state = TrainState(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"] if has_opt else state.opt_state,
            step=restored["step"] if has_opt else state.step,
        )
        start_epoch = int(restored["epoch"]) + 1

    if args.test_only:
        vacc = VideoAccuracy(num_classes)
        eval_iter = (
            _fake_batches(args, num_classes, 2, seed=999)
            if args.fake_data
            else _kinetics_batches(args, "val")
        )
        for batch in eval_iter:
            probs = eval_step(
                state, shard_batch({"video": batch["video"]}, mesh)
            )
            vacc.update(batch["video_id"], probs, batch["label"])
        print(f"video-level acc: {vacc.compute():.4f}")
        return

    for epoch in range(start_epoch, args.epochs):
        logger = utils.MetricLogger()
        if args.fake_data:
            steps = args.steps_per_epoch or 100
            train_iter = _fake_batches(args, num_classes, steps, seed=epoch)
        else:
            train_iter = _kinetics_batches(args, "train", seed=epoch)
        t0 = time.time()
        for batch in logger.log_every(
            train_iter, args.print_freq, f"Epoch [{epoch}]",
        ):
            sharded = shard_batch(
                {"video": batch["video"], "label": batch["label"]}, mesh
            )
            state, loss = train_step(state, sharded)
            logger.update(loss=float(loss))
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s")

        vacc = VideoAccuracy(num_classes)
        for batch in _fake_batches(args, num_classes, 2, seed=999):
            probs = eval_step(
                state,
                shard_batch({"video": batch["video"]}, mesh),
            )
            vacc.update(batch["video_id"], probs, batch["label"])
        print(f"video-level acc: {vacc.compute():.4f}")

        if args.output_dir:
            utils.save_checkpoint(
                os.path.join(args.output_dir, f"checkpoint_{epoch}"),
                {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                    "opt_state": jax.device_get(state.opt_state),
                    "step": jax.device_get(state.step),
                    "epoch": epoch,
                },
            )


def get_args_parser():
    p = argparse.ArgumentParser(description="vision_tpu video classification")
    p.add_argument("--data-path", default="/data/kinetics", type=str)
    p.add_argument("--model", default="r3d_18", type=str)
    p.add_argument("--num-classes", default=400, type=int)
    p.add_argument(
        "--amp", action="store_true",
        help="bf16 compute with f32 master weights (reference --amp)",
    )
    p.add_argument("--clip-len", default=16, type=int)
    p.add_argument("--batch-size", default=8, type=int)
    p.add_argument("--epochs", default=45, type=int)
    p.add_argument("--steps-per-epoch", default=None, type=int)
    p.add_argument("--lr", default=0.01, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument(
        "--weight-decay", "--wd", dest="weight_decay", default=1e-4,
        type=float,
    )
    p.add_argument(
        "--lr-milestones", default=[20, 30, 40], nargs="+", type=int,
        help="MultiStepLR epoch milestones (reference --lr-milestones)",
    )
    p.add_argument("--lr-gamma", default=0.1, type=float)
    p.add_argument("--lr-warmup-epochs", default=0, type=int)
    p.add_argument("--lr-warmup-decay", default=0.001, type=float)
    p.add_argument("--resume", default="", type=str)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument(
        "--test-only", action="store_true",
        help="evaluate video-level accuracy of the (resumed) model",
    )
    p.add_argument(
        "--weights", default=None, type=str,
        help="weights enum name to start from",
    )
    p.add_argument(
        "--sync-bn", action="store_true",
        help="no-op: SPMD BatchNorm statistics are always global",
    )
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--output-dir", default=None, type=str)
    p.add_argument("--size", default=112, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--fake-data", action="store_true")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
