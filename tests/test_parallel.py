"""Parallel layer: mesh, sharding rules, dp+tp train steps on the 8-device
CPU mesh (the JAX-native fake backend, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vision_tpu.parallel import TrainState, make_mesh, make_train_step, replicate, shard_batch
from vision_tpu.parallel.sharding import infer_tp_sharding


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tp_sharding_rules():
    from vision_tpu.models.vision_transformer import VisionTransformer

    mesh = make_mesh(shape=(4, 2), axis_names=("data", "model"))
    vit = VisionTransformer(
        image_size=32, patch_size=8, num_layers=1, num_heads=4,
        hidden_dim=64, mlp_dim=128, num_classes=10,
    )
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    sh = infer_tp_sharding(params, mesh)
    block = sh["encoder.layers.encoder_layer_0"]
    assert block["self_attention"]["in_proj"]["kernel"].spec == P(None, "model")
    assert block["self_attention"]["out_proj"]["kernel"].spec == P("model", None)
    assert block["mlp.0"]["kernel"].spec == P(None, "model")
    assert block["mlp.3"]["kernel"].spec == P("model", None)
    # conv proj stays replicated
    assert sh["conv_proj"]["kernel"].spec == P()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dp_train_step_runs():
    from vision_tpu.models import resnet18

    mesh = make_mesh(8)
    model = resnet18(num_classes=10)
    tx = optax.sgd(0.1)
    state = TrainState(
        params=model.variables["params"],
        batch_stats=model.variables["batch_stats"],
        opt_state=tx.init(model.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(model.module.apply, tx)
    with mesh:
        state = replicate(state, mesh)
        batch = {
            "image": np.random.RandomState(0).rand(16, 32, 32, 3).astype(np.float32),
            "label": np.arange(16, dtype=np.int32) % 10,
        }
        batch = shard_batch(batch, mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_fsdp_sharding_trains_on_8dev_mesh():
    """FSDP (ZeRO-3-style) param sharding: large kernels sharded over the
    data axis, XLA inserts all-gather/reduce-scatter; one ViT step runs and
    per-device param memory drops ~axis-fold for the big leaves."""
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vision_tpu.models.vision_transformer import VisionTransformer
    from vision_tpu.parallel import infer_fsdp_sharding, make_mesh

    mesh = make_mesh(8)
    vit = VisionTransformer(
        image_size=32, patch_size=8, num_layers=2, num_heads=4,
        hidden_dim=64, mlp_dim=256, num_classes=10,
    )
    variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = variables["params"]
    shardings = infer_fsdp_sharding(params, mesh, min_size=2**12)
    flat = jax.tree_util.tree_leaves(shardings)
    assert any(s.spec != P() for s in flat), "nothing sharded"
    with mesh:
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        # big leaves are actually distributed
        big = params["encoder.layers.encoder_layer_0"]["mlp.0"]["kernel"]
        assert big.sharding.spec != P()
        tx = optax.sgd(0.1)
        opt_state = tx.init(params)

        def loss_fn(p, x, y):
            logits = vit.apply({"params": p}, x, train=False)
            return -jnp.mean(
                jnp.sum(
                    jax.nn.one_hot(y, 10) * jax.nn.log_softmax(logits), -1
                )
            )

        @jax.jit
        def step(p, opt_state, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        x = jax.device_put(
            np.random.RandomState(0).rand(16, 32, 32, 3).astype(np.float32),
            NamedSharding(mesh, P("data", None, None, None)),
        )
        y = jax.device_put(
            np.arange(16, dtype=np.int32) % 10,
            NamedSharding(mesh, P("data")),
        )
        params, opt_state, loss = step(params, opt_state, x, y)
        jax.block_until_ready(loss)
        assert np.isfinite(float(loss))
        # updated params keep their FSDP sharding
        assert params["encoder.layers.encoder_layer_0"]["mlp.0"][
            "kernel"
        ].sharding.spec != P()


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_amp_train_step_bf16_compute_f32_master():
    """compute_dtype=bf16 (the --amp path): forward/backward run in bf16
    but master params / opt state / batch_stats stay f32, the update is
    close to the f32 step, and repeated steps decrease the loss."""
    from vision_tpu.models import resnet18

    mesh = make_mesh(8)
    model = resnet18(num_classes=10)
    tx = optax.sgd(0.1)

    def fresh_state():
        return TrainState(
            params=model.variables["params"],
            batch_stats=model.variables["batch_stats"],
            opt_state=tx.init(model.variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    step32 = make_train_step(model.module.apply, tx, donate=False)
    step16 = make_train_step(
        model.module.apply, tx, donate=False, compute_dtype=jnp.bfloat16
    )
    batch = {
        "image": np.random.RandomState(1).rand(16, 32, 32, 3).astype(np.float32),
        "label": np.arange(16, dtype=np.int32) % 10,
    }
    with mesh:
        s32 = replicate(fresh_state(), mesh)
        s16 = replicate(fresh_state(), mesh)
        b = shard_batch(batch, mesh)
        k = jax.random.PRNGKey(0)
        n32, m32 = step32(s32, b, k)
        first16, m16 = step16(s16, b, k)
        losses = [float(m16["loss"])]
        n16 = first16
        for _ in range(3):
            n16, m16 = step16(n16, b, k)
            losses.append(float(m16["loss"]))

    # master state stays f32
    for leaf in jax.tree_util.tree_leaves(n16.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(n16.batch_stats):
        assert leaf.dtype == jnp.float32
    # bf16 step tracks the f32 step (bf16 has ~3 decimal digits)
    assert abs(float(m32["loss"]) - losses[0]) / abs(float(m32["loss"])) < 0.05
    # bf16 rounding compounds along the backprop chain, so per-element (or
    # even per-layer L2) comparison only makes sense where the chain is
    # short: the classifier head's update must track f32 tightly, while the
    # full update vector needs only directional agreement.
    def upd(state):
        return jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - np.asarray(b),
            state.params,
            fresh_state().params,
        )

    u32, u16 = upd(n32), upd(first16)
    head32 = np.concatenate(
        [l.ravel() for l in jax.tree_util.tree_leaves(u32["fc"])]
    )
    head16 = np.concatenate(
        [l.ravel() for l in jax.tree_util.tree_leaves(u16["fc"])]
    )
    assert np.linalg.norm(head16 - head32) / np.linalg.norm(head32) < 0.1
    a32 = np.concatenate([l.ravel() for l in jax.tree_util.tree_leaves(u32)])
    a16 = np.concatenate([l.ravel() for l in jax.tree_util.tree_leaves(u16)])
    cos = a16 @ a32 / (np.linalg.norm(a16) * np.linalg.norm(a32))
    assert cos > 0.8, f"update direction diverged: cos={cos:.3f}"
    # and it optimizes
    assert losses[-1] < losses[0]


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_detection_dp_train_step_runs():
    """RetinaNet DP train step on the 8-device mesh (VERDICT r3 item 6):
    detection is the static-shape stress case (matcher + sampler inside
    the loss); loss must be finite and params replica-consistent after
    the step (a hidden per-device-shape assumption would desync them)."""
    from vision_tpu.models._utils import fast_init
    from vision_tpu.models.detection import retinanet_resnet50_fpn

    mesh = make_mesh(8)
    with fast_init():
        det = retinanet_resnet50_fpn(num_classes=5)
    mod = det.module
    det_vars = dict(det.variables)
    params = det_vars.pop("params")
    tx = optax.sgd(0.01, momentum=0.9)
    with mesh:
        params = replicate(params, mesh)
        rest = replicate(det_vars, mesh)
        opt_state = tx.init(params)

        def loss_fn(p, batch):
            heads = mod.apply({"params": p, **rest}, batch["image"], train=True)
            losses = mod.apply(
                {"params": p, **rest},
                *heads,
                batch["boxes"], batch["labels"], batch["valid"],
                method="compute_loss",
            )
            return sum(jnp.sum(v) for v in losses.values())

        @jax.jit
        def step(p, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(p, batch)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        rng = np.random.RandomState(0)
        batch = {
            "image": rng.rand(8, 64, 64, 3).astype(np.float32),
            "boxes": np.tile(
                np.asarray([[[4.0, 4.0, 30.0, 30.0], [10.0, 12.0, 50.0, 44.0]]],
                           np.float32), (8, 1, 1)),
            "labels": np.tile(np.asarray([[1, 2]], np.int32), (8, 1)),
            "valid": np.ones((8, 2), bool),
        }
        batch = shard_batch(batch, mesh)
        params, opt_state, loss = step(params, opt_state, batch)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))
    # replica consistency: every per-device shard of a replicated param
    # must be identical after the update
    probe = jax.tree_util.tree_leaves(params)[0]
    shards = [np.asarray(s.data) for s in probe.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_two_stage_detection_dp_train_step_runs(monkeypatch):
    """Faster R-CNN DP train step on the 8-device mesh (VERDICT r4 item
    5): images/targets shard over 'data' through the RPN (NMS under
    vmap), proposal sampling, and the RoI heads — with the windowed
    MultiScaleRoIAlign (the TPU runtime path) forced on, so the mesh test
    compiles the same program the chip would run. Loss finite + params
    replica-identical after the step."""
    from vision_tpu.models._utils import fast_init
    from vision_tpu.models.detection import fasterrcnn_resnet50_fpn

    monkeypatch.setenv("VISION_TPU_MSROI", "window")
    mesh = make_mesh(8)
    with fast_init():
        det = fasterrcnn_resnet50_fpn(
            num_classes=5, rpn_pre_nms_top_n=64, rpn_post_nms_top_n=64
        )
    mod = det.module
    det_vars = dict(det.variables)
    params = det_vars.pop("params")
    tx = optax.sgd(0.01, momentum=0.9)
    with mesh:
        params = replicate(params, mesh)
        rest = replicate(det_vars, mesh)
        opt_state = tx.init(params)

        def loss_fn(p, batch, key):
            losses = mod.apply(
                {"params": p, **rest},
                batch["image"],
                batch["boxes"], batch["labels"], batch["valid"],
                key,
                train=False,  # frozen-BN v1 trunk
                method="compute_loss",
            )
            return sum(jnp.sum(v) for v in losses.values())

        @jax.jit
        def step(p, opt_state, batch, key):
            loss, grads = jax.value_and_grad(loss_fn)(p, batch, key)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        rng = np.random.RandomState(0)
        batch = {
            "image": rng.rand(8, 64, 64, 3).astype(np.float32),
            "boxes": np.tile(
                np.asarray([[[4.0, 4.0, 30.0, 30.0], [10.0, 12.0, 50.0, 44.0]]],
                           np.float32), (8, 1, 1)),
            "labels": np.tile(np.asarray([[1, 2]], np.int32), (8, 1)),
            "valid": np.ones((8, 2), bool),
        }
        batch = shard_batch(batch, mesh)
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(7)
        )
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))
    probe = jax.tree_util.tree_leaves(params)[0]
    shards = [np.asarray(s.data) for s in probe.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
