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
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
