"""Torch-oracle forward parity for conversion-risky architectures
(VERDICT.md round-1 item 4): Swin v1/v2, RegNet, MaxViT, and more.

Strategy mirrors the reference's golden-output testing
(``test/test_models.py:134``) with a live torch transcription as the golden
source: random-init the torch model, convert its state dict, compare logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_refs import randomize_bn_stats

# Transcription oracles: superseded in the default lane by the
# reference-import harness (test_reference_parity.py pins builders against
# the actual reference); keep the transcription checks in the full run.
pytestmark = pytest.mark.slow
from vision_tpu._torch_convert import convert_torch_state_dict


def _compare(torch_model, module, x_hw, atol, hooks=None, in_ch=3, seed=0):
    torch_model.eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    x = np.random.RandomState(seed).rand(2, x_hw, x_hw, in_ch)
    x = x.astype(np.float32)
    # shape-only init: the conversion replaces every leaf (strict=True), so
    # paying a real flax init (slow eager initializers) is wasted work
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    )
    variables = convert_torch_state_dict(sd, dict(variables), hooks=hooks)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    fwd = jax.jit(lambda v, t: module.apply(v, t, train=False))
    out = np.asarray(fwd(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-4)


def test_swin_v1_matches_torch():
    """Shifted windows + relative position bias + patch merging."""
    from tests.torch_refs2 import TorchMiniSwin
    from vision_tpu.models.swin_transformer import SwinTransformer, _swin_hooks

    tm = TorchMiniSwin(v2=False)
    module = SwinTransformer(
        patch_size=(2, 2), embed_dim=16, depths=(2, 2), num_heads=(2, 4),
        window_size=(4, 4), mlp_ratio=2.0, num_classes=10, v2=False,
    )
    _compare(tm, module, 32, atol=2e-5, hooks=_swin_hooks)


def test_swin_v2_matches_torch():
    """v2: cosine attention, CPB-MLP bias, post-norm, k-bias zeroing."""
    from tests.torch_refs2 import TorchMiniSwin
    from vision_tpu.models.swin_transformer import SwinTransformer, _swin_hooks

    tm = TorchMiniSwin(v2=True)
    # make the qkv biases non-trivial so the k-zeroing path is exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.Linear) and m.bias is not None:
                m.bias.add_(torch.randn_like(m.bias) * 0.05)
    module = SwinTransformer(
        patch_size=(2, 2), embed_dim=16, depths=(2, 2), num_heads=(2, 4),
        window_size=(4, 4), mlp_ratio=2.0, num_classes=10, v2=True,
    )
    _compare(tm, module, 32, atol=2e-5, hooks=_swin_hooks)


def test_regnet_matches_torch():
    """Grouped bottleneck + SE + trunk_output key layout."""
    from tests.torch_refs2 import TorchMiniRegNet
    from vision_tpu.models.regnet import RegNet

    tm = randomize_bn_stats(TorchMiniRegNet())
    module = RegNet(
        stage_params=((16, 2, 1, 8, 1.0), (24, 2, 2, 8, 1.0)),
        se_ratio=0.25, stem_width=8, num_classes=10,
    )
    _compare(tm, module, 32, atol=1e-4)


def test_maxvit_matches_torch():
    """MBConv + window/grid partition attention (feat_dim**-0.5 k-scaling)."""
    from tests.torch_refs2 import TorchMiniMaxVit
    from vision_tpu.models.maxvit import MaxVit, _maxvit_hooks

    tm = randomize_bn_stats(TorchMiniMaxVit())
    module = MaxVit(
        stem_channels=8, block_channels=(8, 16), block_layers=(1, 1),
        head_dim=4, partition_size=2, mlp_ratio=2, num_classes=10,
        stochastic_depth_prob=0.0,
    )
    _compare(tm, module, 32, atol=5e-5, hooks=_maxvit_hooks)


def test_convnext_matches_torch():
    """LayerNorm2d stem/downsample + CNBlock layer-scale."""
    from tests.torch_refs2 import TorchMiniConvNeXt
    from vision_tpu.models.convnext import CNBlockConfig, ConvNeXt

    tm = TorchMiniConvNeXt()
    module = ConvNeXt(
        block_setting=(CNBlockConfig(16, 32, 2), CNBlockConfig(32, None, 2)),
        num_classes=10,
    )
    _compare(tm, module, 32, atol=2e-5)


def test_mobilenet_v3_matches_torch():
    """SE-hardsigmoid + hardswish + expand-skip inverted residuals."""
    from tests.torch_refs2 import TorchMiniMobileNetV3
    from vision_tpu.models.mobilenetv3 import IRConf, MobileNetV3

    tm = randomize_bn_stats(TorchMiniMobileNetV3())
    module = MobileNetV3(
        setting=(
            IRConf(8, 3, 8, 8, False, False, 1, 1),
            IRConf(8, 3, 24, 12, False, True, 2, 1),
            IRConf(12, 5, 36, 12, True, True, 1, 1),
        ),
        last_channel=32,
        num_classes=10,
    )
    _compare(tm, module, 32, atol=5e-5)


def test_googlenet_matches_torch_eval():
    """Full GoogLeNet, eval logits (aux params converted but unused)."""
    from tests.torch_refs2 import TorchGoogLeNet
    from vision_tpu.models.googlenet import GoogLeNet, _googlenet_hooks

    tm = randomize_bn_stats(TorchGoogLeNet(num_classes=10, aux_logits=True))
    module = GoogLeNet(num_classes=10, aux_logits=True)
    _compare(tm, module, 128, atol=1e-3, hooks=_googlenet_hooks(True))


def test_googlenet_aux_heads_match_torch_train():
    """Aux heads compared in train mode (BN batch stats, dropout=0)."""
    from tests.torch_refs2 import TorchGoogLeNet
    from vision_tpu.models.googlenet import GoogLeNet, _googlenet_hooks

    tm = randomize_bn_stats(TorchGoogLeNet(num_classes=10, aux_logits=True))
    tm.train()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    module = GoogLeNet(
        num_classes=10, aux_logits=True, dropout=0.0, dropout_aux=0.0
    )
    x = np.random.RandomState(0).rand(2, 128, 128, 3).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    variables = convert_torch_state_dict(
        sd, dict(variables), hooks=_googlenet_hooks(True)
    )
    with torch.no_grad():
        ref_logits, ref_aux2, ref_aux1 = tm(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        )
    out, _ = module.apply(
        variables,
        jnp.asarray(x),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), ref_logits.numpy(), atol=2e-3, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.aux_logits2), ref_aux2.numpy(), atol=2e-3, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.aux_logits1), ref_aux1.numpy(), atol=2e-3, rtol=1e-4
    )


def test_raft_corr_block_matches_torch_grid_sample():
    """Correlation pyramid + neighborhood lookup vs the reference's
    grid_sample(align_corners=True) formulation — pins the neighborhood
    channel ORDER (weights consume it) and bilinear/out-of-bounds semantics."""
    from tests.torch_refs2 import TorchCorrBlock
    from vision_tpu.models.optical_flow.raft import CorrBlock

    rng = np.random.RandomState(0)
    b, h, w, c = 1, 16, 12, 8
    f1 = rng.rand(b, h, w, c).astype(np.float32)
    f2 = rng.rand(b, h, w, c).astype(np.float32)
    # coords: base grid + random flow, partially out of bounds
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([xs, ys], -1)[None].astype(np.float32)
    coords = coords + rng.uniform(-3, 3, coords.shape).astype(np.float32)

    tcb = TorchCorrBlock(num_levels=2, radius=2)
    tcb.build_pyramid(
        torch.from_numpy(f1).permute(0, 3, 1, 2),
        torch.from_numpy(f2).permute(0, 3, 1, 2),
    )
    with torch.no_grad():
        ref = tcb.index_pyramid(
            torch.from_numpy(coords).permute(0, 3, 1, 2)
        ).permute(0, 2, 3, 1).numpy()

    cb = CorrBlock(num_levels=2, radius=2)
    pyr = cb.build_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    out = np.asarray(cb.index_pyramid(pyr, jnp.asarray(coords)))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_raft_update_block_matches_torch():
    """Motion encoder + 1x5/5x1 ConvGRU chain + flow head."""
    from tests.torch_refs2 import TorchUpdateBlock
    from vision_tpu.models.optical_flow.raft import UpdateBlock

    in_corr = 2 * (2 * 2 + 1) ** 2  # num_levels=2, radius=2
    tm = TorchUpdateBlock(in_corr)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    module = UpdateBlock(
        in_channels_corr=in_corr, hidden_state_size=16,
        corr_layers=(16, 12), flow_layers=(8, 4), motion_out=16,
        flow_head_hidden=24,
    )
    rng = np.random.RandomState(1)
    h = rng.rand(2, 8, 8, 16).astype(np.float32)
    ctx = rng.rand(2, 8, 8, 16).astype(np.float32)
    corr = rng.rand(2, 8, 8, in_corr).astype(np.float32)
    flow = rng.uniform(-2, 2, (2, 8, 8, 2)).astype(np.float32)
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.asarray(h), jnp.asarray(ctx), jnp.asarray(corr), jnp.asarray(flow),
    )
    variables = convert_torch_state_dict(sd, dict(variables))
    t = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref_h, ref_d = tm(t(h), t(ctx), t(corr), t(flow))
    out_h, out_d = module.apply(
        variables, jnp.asarray(h), jnp.asarray(ctx), jnp.asarray(corr),
        jnp.asarray(flow),
    )
    np.testing.assert_allclose(
        np.asarray(out_h), ref_h.permute(0, 2, 3, 1).numpy(), atol=2e-5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_d), ref_d.permute(0, 2, 3, 1).numpy(), atol=2e-5,
        rtol=1e-4,
    )


def test_rpn_slice_matches_torch():
    """RPNHead conv tower + BoxCoder decode + filter_proposals on a tiny
    2-level FPN vs a dynamic-shape torch transcription of rpn.py:242."""
    from tests.torch_refs2 import TorchRPNHead, torch_filter_proposals
    from vision_tpu.models.detection.rpn import (
        RegionProposalNetwork, RPNHead,
    )

    rng = np.random.RandomState(0)
    num_anchors = 3
    feats = [
        rng.rand(1, 8, 8, 16).astype(np.float32),
        rng.rand(1, 4, 4, 16).astype(np.float32),
    ]
    tm = TorchRPNHead(16, num_anchors)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    module = RPNHead(num_anchors=num_anchors)
    variables = module.init(
        jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats]
    )
    variables = convert_torch_state_dict(sd, dict(variables))

    # head output parity (incl. the (H, W, A) flatten order)
    with torch.no_grad():
        t_obj, t_dl = tm([torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats])
    obj, dl = module.apply(variables, [jnp.asarray(f) for f in feats])
    for lvl in range(2):
        a = t_obj[lvl].permute(0, 2, 3, 1).reshape(1, -1).numpy()
        np.testing.assert_allclose(np.asarray(obj[lvl]), a, atol=2e-6)
        d = (
            t_dl[lvl]
            .permute(0, 2, 3, 1)
            .reshape(1, -1, 4)
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(dl[lvl]), d, atol=2e-6)

    # anchors: simple per-level grids (stride 8 / 16), 3 sizes
    def grid_anchors(fh, fw, stride):
        out = []
        for y in range(fh):
            for x in range(fw):
                cx, cy = x * stride + stride / 2, y * stride + stride / 2
                for s in (16, 32, 48):
                    out.append([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2])
        return np.asarray(out, np.float32)

    anchors = [grid_anchors(8, 8, 8), grid_anchors(4, 4, 16)]
    image_size = (64, 64)

    ref_boxes, ref_scores = torch_filter_proposals(
        [t_obj[0].permute(0, 2, 3, 1).reshape(-1),
         t_obj[1].permute(0, 2, 3, 1).reshape(-1)],
        [t_dl[0].permute(0, 2, 3, 1).reshape(-1, 4),
         t_dl[1].permute(0, 2, 3, 1).reshape(-1, 4)],
        [torch.from_numpy(a) for a in anchors],
        image_size,
    )

    rpn = RegionProposalNetwork(
        pre_nms_top_n=60, post_nms_top_n=40, nms_thresh=0.7
    )
    props = rpn.filter_proposals(
        obj, dl, [jnp.asarray(a) for a in anchors], image_size
    )
    got_valid = np.asarray(props.valid[0])
    got_boxes = np.asarray(props.boxes[0])[got_valid]
    got_scores = 1 / (1 + np.exp(-np.asarray(props.scores[0])[got_valid]))
    assert got_boxes.shape == ref_boxes.shape, (
        got_boxes.shape, ref_boxes.shape,
    )
    np.testing.assert_allclose(got_boxes, ref_boxes, atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(got_scores, ref_scores, atol=1e-5, rtol=1e-4)


def test_mnasnet_matches_torch():
    """Flat layers.N key space + first-block expansion quirk."""
    from tests.torch_refs2 import TorchMNASNet
    from vision_tpu.models.mnasnet import MNASNet

    tm = randomize_bn_stats(TorchMNASNet(num_classes=10))
    module = MNASNet(alpha=1.0, num_classes=10)
    _compare(tm, module, 64, atol=5e-4)


def test_squeezenet_1_1_matches_torch():
    """Fire modules + conv classifier + ceil-mode max pools."""
    from tests.torch_refs2 import TorchSqueezeNet11
    from vision_tpu.models.squeezenet import SqueezeNet

    tm = TorchSqueezeNet11(num_classes=10)
    module = SqueezeNet(version="1_1", num_classes=10)
    _compare(tm, module, 64, atol=5e-5)


def test_alexnet_matches_torch():
    """CHW-flatten classifier reorder hook + adaptive pool."""
    from tests.torch_refs2 import TorchAlexNet
    from vision_tpu.models.alexnet import AlexNet, _alexnet_hooks

    tm = TorchAlexNet(num_classes=10)
    module = AlexNet(num_classes=10)
    _compare(tm, module, 224, atol=2e-4, hooks=_alexnet_hooks)


def test_inception_v3_matches_torch_eval():
    """Full Inception v3 at 299: asymmetric 1x7/7x1 convs, mixed blocks."""
    from tests.torch_refs2 import TorchInception3
    from vision_tpu.models.inception import Inception3

    tm = randomize_bn_stats(TorchInception3(num_classes=10, aux_logits=True))
    module = Inception3(num_classes=10, aux_logits=True)
    _compare(tm, module, 299, atol=1e-3)


def test_inception_v3_aux_matches_torch_train():
    """Aux head (avgpool5s3 + conv tower) in train mode, dropout 0."""
    from tests.torch_refs2 import TorchInception3
    from vision_tpu.models.inception import Inception3

    tm = randomize_bn_stats(TorchInception3(num_classes=10, aux_logits=True))
    tm.train()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    module = Inception3(num_classes=10, aux_logits=True, dropout=0.0)
    # batch 2: torch BatchNorm refuses train-mode stats on 1 value/channel
    x = np.random.RandomState(0).rand(2, 299, 299, 3).astype(np.float32)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    )
    variables = convert_torch_state_dict(sd, dict(variables))
    with torch.no_grad():
        ref_logits, ref_aux = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    fwd = jax.jit(
        lambda v, t: module.apply(
            v, t, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
    )
    out, _ = fwd(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out.logits), ref_logits.numpy(), atol=3e-3, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.aux_logits), ref_aux.numpy(), atol=3e-3, rtol=1e-4
    )


def test_deeplab_head_matches_torch():
    """ASPP (atrous branches + global pooling broadcast) + head convs."""
    from tests.torch_refs2 import TorchDeepLabHead
    from vision_tpu.models.segmentation.deeplabv3 import DeepLabHead

    tm = randomize_bn_stats(TorchDeepLabHead(32, num_classes=7, rates=(2, 4, 6)))
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    module = DeepLabHead(num_classes=7, atrous_rates=(2, 4, 6))
    x = np.random.RandomState(0).rand(2, 16, 16, 32).astype(np.float32)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    )
    variables = convert_torch_state_dict(sd, dict(variables))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(
        jax.jit(lambda v, t: module.apply(v, t, train=False))(
            variables, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(
        out, ref.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


def test_fcn_head_matches_torch():
    from tests.torch_refs2 import TorchFCNHead
    from vision_tpu.models.segmentation.fcn import FCNHead

    tm = randomize_bn_stats(TorchFCNHead(64, num_classes=5))
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    module = FCNHead(channels=5)
    x = np.random.RandomState(1).rand(2, 8, 8, 64).astype(np.float32)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    )
    variables = convert_torch_state_dict(sd, dict(variables))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(module.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(
        out, ref.transpose(0, 2, 3, 1), atol=2e-5, rtol=1e-4
    )


def test_mvit_pooled_attention_matches_torch():
    """MViT multiscale attention: depthwise-conv3d token pooling, decomposed
    relative positions (h/w/t), pooled-q residual (reference
    ``video/mvit.py:196``)."""
    from tests.torch_refs2 import TorchMultiscaleAttention
    from vision_tpu.models.video.mvit import MSBlockConfig, MultiscaleAttention

    thw = (2, 4, 4)
    tm = TorchMultiscaleAttention(
        thw, embed_dim=8, output_dim=8, heads=2,
        kernel_q=(3, 3, 3), stride_q=(1, 2, 2),
        kernel_kv=(3, 3, 3), stride_kv=(1, 2, 2),
    )
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cnf = MSBlockConfig(
        num_heads=2, input_channels=8, output_channels=8,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
        stride_q=(1, 2, 2), stride_kv=(1, 2, 2),
    )
    module = MultiscaleAttention(
        thw=thw, embed_dim=8, output_dim=8, num_heads=2, cnf=cnf,
        residual_pool=True, residual_with_cls_embed=False,
        rel_pos_embed=True, input_size=thw,
    )
    n = 2 * 4 * 4 + 1
    x = np.random.RandomState(0).rand(2, n, 8).astype(np.float32)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    )
    variables = convert_torch_state_dict(sd, dict(variables))
    with torch.no_grad():
        ref, ref_thw = tm(torch.from_numpy(x), thw)
    out, q_thw = module.apply(variables, jnp.asarray(x))
    assert tuple(q_thw) == tuple(ref_thw)
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy(), atol=2e-5, rtol=1e-4
    )


def test_two_stage_e2e_matches_torch():
    """End-to-end two-stage detector slice vs torch (VERDICT r1 item 4):
    RPNHead -> filter_proposals -> MultiScaleRoIAlign (LevelMapper) ->
    TwoMLPHead -> FastRCNNPredictor -> postprocess_detections, static
    padded/masked path vs the dynamic-shape transcription of
    roi_heads.py:504-887."""
    from tests.torch_refs2 import (
        TorchFastRCNNPredictor,
        TorchRPNHead,
        TorchTwoMLPHead,
        torch_filter_proposals,
        torch_multiscale_roi_align,
        torch_postprocess_detections,
    )
    from vision_tpu.models.detection.roi_heads import (
        FastRCNNPredictor,
        RoIHeadsLogic,
        TwoMLPHead,
    )
    from vision_tpu.models.detection.rpn import (
        RegionProposalNetwork,
        RPNHead,
    )
    from vision_tpu.ops.poolers import MultiScaleRoIAlign

    rng = np.random.RandomState(1)
    num_anchors = 3
    num_classes = 5
    image_size = (64, 64)
    feats = [
        rng.rand(1, 8, 8, 16).astype(np.float32),
        rng.rand(1, 4, 4, 16).astype(np.float32),
    ]

    # --- RPN (parity established in test_rpn_slice_matches_torch) ---
    tm_rpn = TorchRPNHead(16, num_anchors)
    tm_rpn.eval()
    rpn_head = RPNHead(num_anchors=num_anchors)
    variables = rpn_head.init(
        jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats]
    )
    variables = convert_torch_state_dict(
        {k: v.detach().numpy() for k, v in tm_rpn.state_dict().items()},
        dict(variables),
    )
    obj, dl = rpn_head.apply(variables, [jnp.asarray(f) for f in feats])

    def grid_anchors(fh, fw, stride):
        out = []
        for y in range(fh):
            for x in range(fw):
                cx, cy = x * stride + stride / 2, y * stride + stride / 2
                for s in (16, 32, 48):
                    out.append(
                        [cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2]
                    )
        return np.asarray(out, np.float32)

    anchors = [grid_anchors(8, 8, 8), grid_anchors(4, 4, 16)]
    with torch.no_grad():
        t_obj, t_dl = tm_rpn(
            [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
        )
    ref_boxes, _ = torch_filter_proposals(
        [t_obj[i].permute(0, 2, 3, 1).reshape(-1) for i in range(2)],
        [t_dl[i].permute(0, 2, 3, 1).reshape(-1, 4) for i in range(2)],
        [torch.from_numpy(a) for a in anchors],
        image_size,
    )
    rpn = RegionProposalNetwork(
        pre_nms_top_n=60, post_nms_top_n=40, nms_thresh=0.7
    )
    props = rpn.filter_proposals(
        obj, dl, [jnp.asarray(a) for a in anchors], image_size
    )

    # --- box branch weights (shared torch/jax) ---
    tm_head = TorchTwoMLPHead(16 * 7 * 7, 64)
    tm_pred = TorchFastRCNNPredictor(64, num_classes)
    tm_head.eval(), tm_pred.eval()

    head = TwoMLPHead(representation_size=64)
    head_vars = head.init(jax.random.PRNGKey(1), jnp.zeros((1, 7, 7, 16)))

    def _head_hooks(sd):
        w = np.asarray(sd["fc6.weight"])
        sd["fc6.weight"] = (
            w.reshape(w.shape[0], 16, 7, 7)
            .transpose(0, 2, 3, 1)
            .reshape(w.shape[0], -1)
        )
        return sd

    head_vars = convert_torch_state_dict(
        {k: v.detach().numpy() for k, v in tm_head.state_dict().items()},
        dict(head_vars),
        hooks=_head_hooks,
    )
    pred = FastRCNNPredictor(num_classes=num_classes)
    pred_vars = pred.init(jax.random.PRNGKey(2), jnp.zeros((1, 64)))
    pred_vars = convert_torch_state_dict(
        {k: v.detach().numpy() for k, v in tm_pred.state_dict().items()},
        dict(pred_vars),
    )

    # --- torch reference chain (dynamic shapes) ---
    pooled_ref = torch_multiscale_roi_align(
        [f[0] for f in feats], ref_boxes, image_size
    )  # [K, 7, 7, C] NHWC
    with torch.no_grad():
        rep = tm_head(
            torch.from_numpy(
                pooled_ref.transpose(0, 3, 1, 2).astype(np.float32)
            )
        )
        t_logits, t_reg = tm_pred(rep)
    want_boxes, want_scores, want_labels = torch_postprocess_detections(
        t_logits, t_reg, torch.from_numpy(ref_boxes), image_size,
        score_thresh=0.1,
    )

    # --- vision_tpu chain (static padded/masked) ---
    pooler = MultiScaleRoIAlign(["0", "1"], 7, sampling_ratio=2)
    pboxes = np.asarray(props.boxes[0])
    rois = jnp.asarray(
        np.concatenate(
            [np.zeros((pboxes.shape[0], 1), np.float32), pboxes], axis=1
        )
    )
    pooled = pooler(
        {"0": jnp.asarray(feats[0]), "1": jnp.asarray(feats[1])},
        rois,
        image_size,
    )
    rep_j = head.apply(head_vars, pooled)
    logits_j, reg_j = pred.apply(pred_vars, rep_j)

    logic = RoIHeadsLogic(score_thresh=0.1)
    det = logic.postprocess_detections(
        logits_j[None],
        reg_j[None],
        props.boxes[:1],
        props.valid[:1],
        image_size,
    )
    got_valid = np.asarray(det.valid[0])
    got_boxes = np.asarray(det.boxes[0])[got_valid]
    got_scores = np.asarray(det.scores[0])[got_valid]
    got_labels = np.asarray(det.labels[0])[got_valid]

    assert got_boxes.shape == want_boxes.shape, (
        got_boxes.shape, want_boxes.shape,
    )
    np.testing.assert_allclose(got_boxes, want_boxes, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-5)
    np.testing.assert_array_equal(got_labels, want_labels)


def test_swin3d_shifted_window_attention_matches_torch():
    """3D shifted-window attention (swin3d): shrink-adjusted windows,
    cyclic shift + 9-region 3D mask, full-table relative position bias —
    vs a dynamic torch transcription (reference
    video/swin_transformer.py shifted_window_attention_3d)."""
    from tests.torch_refs2 import torch_shifted_window_attention_3d
    from vision_tpu.models.video.swin_transformer import (
        ShiftedWindowAttention3d,
    )

    rng = np.random.RandomState(0)
    dim, heads = 16, 4
    window, shift = (2, 3, 3), (1, 1, 1)
    # T smaller than the window triggers the shrink-adjust path too
    for t, h, w in [(4, 7, 8), (1, 6, 6)]:
        x = rng.randn(2, t, h, w, dim).astype(np.float32) * 0.5
        module = ShiftedWindowAttention3d(
            dim=dim, window_size=window, shift_size=shift, num_heads=heads
        )
        variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
        p = variables["params"]
        got = np.asarray(module.apply(variables, jnp.asarray(x)))

        qkv_w = torch.from_numpy(np.asarray(p["qkv"]["kernel"]).T.copy())
        qkv_b = torch.from_numpy(np.asarray(p["qkv"]["bias"]).copy())
        proj_w = torch.from_numpy(np.asarray(p["proj"]["kernel"]).T.copy())
        proj_b = torch.from_numpy(np.asarray(p["proj"]["bias"]).copy())
        table = torch.from_numpy(
            np.asarray(p["relative_position_bias_table"]).copy()
        )
        with torch.no_grad():
            want = torch_shifted_window_attention_3d(
                torch.from_numpy(x), qkv_w, qkv_b, proj_w, proj_b,
                table, window, shift, heads,
            ).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_retinanet_postprocess_matches_torch():
    """Single-stage postprocess: per-level sigmoid/top-k/decode/clip +
    cross-level class-aware NMS (static masked path) vs the
    dynamic-shape transcription of retinanet.py:509."""
    from tests.torch_refs2 import torch_retinanet_postprocess
    from vision_tpu.models.detection import _utils as det_utils
    from vision_tpu.models.detection.retinanet import RetinaNet

    rng = np.random.RandomState(0)
    num_classes = 6
    image_size = (64, 64)

    def grid_anchors(fh, fw, stride):
        out = []
        for yy in range(fh):
            for xx in range(fw):
                cx = xx * stride + stride / 2
                cy = yy * stride + stride / 2
                for s in (16, 32):
                    out.append(
                        [cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2]
                    )
        return np.asarray(out, np.float32)

    anchors = [grid_anchors(8, 8, 8), grid_anchors(4, 4, 16)]
    cls_logits = [
        rng.randn(1, 8 * 8 * 2, num_classes).astype(np.float32),
        rng.randn(1, 4 * 4 * 2, num_classes).astype(np.float32),
    ]
    reg = [
        (rng.randn(1, 8 * 8 * 2, 4) * 0.4).astype(np.float32),
        (rng.randn(1, 4 * 4 * 2, 4) * 0.4).astype(np.float32),
    ]

    class _Logic:
        box_coder = det_utils.BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))
        score_thresh = 0.6
        nms_thresh = 0.5
        detections_per_img = 40
        topk_candidates = 100

    det = RetinaNet.postprocess_detections(
        _Logic(),
        [jnp.asarray(c) for c in cls_logits],
        [jnp.asarray(r) for r in reg],
        [jnp.asarray(a) for a in anchors],
        image_size,
    )
    got_valid = np.asarray(det.valid[0])
    got_boxes = np.asarray(det.boxes[0])[got_valid]
    got_scores = np.asarray(det.scores[0])[got_valid]
    got_labels = np.asarray(det.labels[0])[got_valid]

    want_boxes, want_scores, want_labels = torch_retinanet_postprocess(
        [torch.from_numpy(c[0]) for c in cls_logits],
        [torch.from_numpy(r[0]) for r in reg],
        [torch.from_numpy(a) for a in anchors],
        image_size,
        score_thresh=0.6, nms_thresh=0.5, topk_candidates=100,
        detections_per_img=40,
    )
    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_boxes, want_boxes, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-6)
    np.testing.assert_array_equal(got_labels, want_labels)


def test_ssd_postprocess_matches_torch():
    """SSD postprocess (softmax + per-class candidates + batched NMS,
    weights 10,10,5,5) vs the dynamic transcription of reference
    ssd.py postprocess_detections."""
    from tests.torch_refs2 import torch_ssd_postprocess
    from vision_tpu.models.detection import _utils as det_utils
    from vision_tpu.models.detection.ssd import SSD

    rng = np.random.RandomState(2)
    num_classes, r = 5, 120
    image_size = (64, 64)
    xy = rng.uniform(4, 56, (r, 2)).astype(np.float32)
    wh = rng.uniform(8, 24, (r, 2)).astype(np.float32)
    anchors = np.concatenate([xy - wh / 2, xy + wh / 2], 1)
    cls_logits = rng.randn(1, r, num_classes).astype(np.float32)
    reg = (rng.randn(1, r, 4) * 0.5).astype(np.float32)

    class _Logic:
        box_coder = det_utils.BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))
        score_thresh = 0.25
        nms_thresh = 0.45
        detections_per_img = 60
        topk_candidates = 100

    det = SSD.postprocess_detections(
        _Logic(),
        jnp.asarray(cls_logits),
        jnp.asarray(reg),
        jnp.asarray(anchors),
        image_size,
    )
    got_valid = np.asarray(det.valid[0])
    got_boxes = np.asarray(det.boxes[0])[got_valid]
    got_scores = np.asarray(det.scores[0])[got_valid]
    got_labels = np.asarray(det.labels[0])[got_valid]

    want_boxes, want_scores, want_labels = torch_ssd_postprocess(
        torch.from_numpy(cls_logits[0]),
        torch.from_numpy(reg[0]),
        torch.from_numpy(anchors),
        image_size,
        score_thresh=0.25, nms_thresh=0.45, topk_candidates=100,
        detections_per_img=60,
    )
    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_boxes, want_boxes, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-6)
    np.testing.assert_array_equal(got_labels, want_labels)


def test_fcos_postprocess_matches_torch():
    """FCOS anchor-free postprocess: sqrt(cls*ctrness) scoring +
    BoxLinearCoder decode vs the dynamic transcription."""
    from tests.torch_refs2 import torch_fcos_postprocess
    from vision_tpu.models.detection import _utils as det_utils
    from vision_tpu.models.detection.fcos import FCOS

    rng = np.random.RandomState(4)
    num_classes = 4
    image_size = (64, 64)

    def grid_anchors(fh, fw, stride):
        out = []
        for yy in range(fh):
            for xx in range(fw):
                cx = xx * stride + stride / 2
                cy = yy * stride + stride / 2
                out.append(
                    [cx - stride / 2, cy - stride / 2,
                     cx + stride / 2, cy + stride / 2]
                )
        return np.asarray(out, np.float32)

    anchors = [grid_anchors(8, 8, 8), grid_anchors(4, 4, 16)]
    logits = [
        rng.randn(1, 64, num_classes).astype(np.float32),
        rng.randn(1, 16, num_classes).astype(np.float32),
    ]
    reg = [
        np.abs(rng.randn(1, 64, 4)).astype(np.float32),
        np.abs(rng.randn(1, 16, 4)).astype(np.float32),
    ]
    ctr = [
        rng.randn(1, 64, 1).astype(np.float32),
        rng.randn(1, 16, 1).astype(np.float32),
    ]

    class _Logic:
        box_coder = det_utils.BoxLinearCoder(normalize_by_size=True)
        score_thresh = 0.35
        nms_thresh = 0.6
        detections_per_img = 30
        topk_candidates = 80

    det = FCOS.postprocess_detections(
        _Logic(),
        [jnp.asarray(x) for x in logits],
        [jnp.asarray(x) for x in reg],
        [jnp.asarray(x) for x in ctr],
        [jnp.asarray(a) for a in anchors],
        image_size,
    )
    got_valid = np.asarray(det.valid[0])
    got_boxes = np.asarray(det.boxes[0])[got_valid]
    got_scores = np.asarray(det.scores[0])[got_valid]
    got_labels = np.asarray(det.labels[0])[got_valid]

    want_boxes, want_scores, want_labels = torch_fcos_postprocess(
        [torch.from_numpy(x[0]) for x in logits],
        [torch.from_numpy(x[0]) for x in reg],
        [torch.from_numpy(x[0]) for x in ctr],
        [torch.from_numpy(a) for a in anchors],
        image_size,
        score_thresh=0.35, nms_thresh=0.6, topk_candidates=80,
        detections_per_img=30,
    )
    assert got_boxes.shape == want_boxes.shape
    np.testing.assert_allclose(got_boxes, want_boxes, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got_scores, want_scores, atol=1e-6)
    np.testing.assert_array_equal(got_labels, want_labels)


def test_ssd_loss_matches_torch_transcription():
    """SSD training loss: SSDMatcher (threshold + FORCED best-anchor-per-
    gt, later gt wins) + smooth-L1 on foreground + CE with 3:1 hard
    negative mining, vs a dynamic numpy/torch transcription of reference
    ssd.py compute_loss + _utils.py SSDMatcher."""
    from vision_tpu.models.detection import _utils as det_utils
    from vision_tpu.models.detection.ssd import SSD

    rng = np.random.RandomState(3)
    r, num_classes, g = 40, 5, 3
    xy = rng.uniform(4, 56, (r, 2)).astype(np.float32)
    wh = rng.uniform(8, 24, (r, 2)).astype(np.float32)
    anchors = np.concatenate([xy - wh / 2, xy + wh / 2], 1)
    gt = np.asarray(
        [[8, 8, 28, 30], [30, 30, 55, 52], [5, 40, 20, 60]], np.float32
    )
    gt_labels = np.asarray([1, 3, 2])
    cls_logits = rng.randn(1, r, num_classes).astype(np.float32)
    reg = (rng.randn(1, r, 4) * 0.3).astype(np.float32)

    class _Logic:
        box_coder = det_utils.BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))
        proposal_matcher = det_utils.SSDMatcher(0.5)
        neg_to_pos_ratio = 3

    losses = SSD.compute_loss(
        _Logic(),
        jnp.asarray(cls_logits),
        jnp.asarray(reg),
        jnp.asarray(anchors),
        jnp.asarray(gt)[None],
        jnp.asarray(gt_labels)[None],
        jnp.ones((1, g), bool),
    )

    # ---- transcription (reference ssd.py compute_loss + SSDMatcher) ----
    def iou(a, b):
        x1 = np.maximum(a[:, None, 0], b[None, :, 0])
        y1 = np.maximum(a[:, None, 1], b[None, :, 1])
        x2 = np.minimum(a[:, None, 2], b[None, :, 2])
        y2 = np.minimum(a[:, None, 3], b[None, :, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (aa[:, None] + ab[None] - inter)

    m = iou(gt, anchors)  # [M, N]
    matched = np.where(m.max(0) >= 0.5, m.argmax(0), -1)
    for gi in range(g):  # sequential forced assignment, later gt wins
        matched[m[gi].argmax()] = gi
    fg = matched >= 0
    num_fg = max(int(fg.sum()), 1)

    mb = gt[np.clip(matched, 0, None)]
    # encode with weights (10, 10, 5, 5)
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + aw / 2
    acy = anchors[:, 1] + ah / 2
    gw = mb[:, 2] - mb[:, 0]
    gh = mb[:, 3] - mb[:, 1]
    gcx = mb[:, 0] + gw / 2
    gcy = mb[:, 1] + gh / 2
    t = np.stack(
        [10 * (gcx - acx) / aw, 10 * (gcy - acy) / ah,
         5 * np.log(gw / aw), 5 * np.log(gh / ah)], -1)
    d = np.abs(reg[0] - t)
    sl1 = np.where(d < 1, 0.5 * d**2, d - 0.5).sum(-1)
    want_bbox = sl1[fg].sum() / num_fg

    tgt = np.where(fg, gt_labels[np.clip(matched, 0, None)], 0)
    lsm = torch.log_softmax(torch.from_numpy(cls_logits[0]), -1).numpy()
    ce = -lsm[np.arange(r), tgt]
    neg = ce.copy()
    neg[fg] = -np.inf
    order = np.argsort(-neg, kind="stable")
    keep_neg = np.zeros(r, bool)
    keep_neg[order[: 3 * num_fg]] = True
    keep_neg &= ~fg
    want_cls = (ce[fg].sum() + ce[keep_neg].sum()) / num_fg

    np.testing.assert_allclose(
        float(losses["bbox_regression"]), want_bbox, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(losses["classification"]), want_cls, rtol=1e-5
    )


def test_retinanet_loss_matches_torch_transcription():
    """RetinaNet training losses: Matcher(0.5, 0.4, low-quality allowed)
    + sigmoid focal loss over valid (non-between) anchors + L1 on
    foreground, vs a numpy/torch transcription of reference
    retinanet.py:158-300."""
    from vision_tpu.models.detection import _utils as det_utils
    from vision_tpu.models.detection.retinanet import RetinaNet

    rng = np.random.RandomState(6)
    r, num_classes, g = 60, 4, 2
    xy = rng.uniform(4, 56, (r, 2)).astype(np.float32)
    wh = rng.uniform(8, 24, (r, 2)).astype(np.float32)
    anchors = np.concatenate([xy - wh / 2, xy + wh / 2], 1)
    gt = np.asarray([[8, 8, 30, 30], [28, 30, 56, 55]], np.float32)
    gt_labels = np.asarray([1, 3])
    cls_logits = rng.randn(1, r, num_classes).astype(np.float32)
    reg = (rng.randn(1, r, 4) * 0.3).astype(np.float32)

    class _Logic:
        num_classes = 4
        box_coder = det_utils.BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))
        proposal_matcher = det_utils.Matcher(
            0.5, 0.4, allow_low_quality_matches=True
        )

    losses = RetinaNet.compute_loss(
        _Logic(),
        [jnp.asarray(cls_logits)],
        [jnp.asarray(reg)],
        [jnp.asarray(anchors)],
        jnp.asarray(gt)[None],
        jnp.asarray(gt_labels)[None],
        jnp.ones((1, g), bool),
    )

    # ---- transcription ----
    def iou(a, b):
        x1 = np.maximum(a[:, None, 0], b[None, :, 0])
        y1 = np.maximum(a[:, None, 1], b[None, :, 1])
        x2 = np.minimum(a[:, None, 2], b[None, :, 2])
        y2 = np.minimum(a[:, None, 3], b[None, :, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (aa[:, None] + ab[None] - inter)

    m = iou(gt, anchors)
    mv = m.max(0)
    matched = m.argmax(0)
    all_matches = matched.copy()
    matched = np.where(mv < 0.4, -1, matched)
    matched = np.where((mv >= 0.4) & (mv < 0.5), -2, matched)
    # allow_low_quality: every anchor tying a gt's best quality restored
    best_per_gt = m.max(1, keepdims=True)
    restore = (m == best_per_gt).any(0)
    matched = np.where(restore, all_matches, matched)

    fg = matched >= 0
    num_fg = max(int(fg.sum()), 1)
    tgt = np.zeros((r, num_classes), np.float32)
    tgt[fg, gt_labels[np.clip(matched, 0, None)[fg]]] = 1.0
    valid_anchor = matched != -2
    logits_t = torch.from_numpy(cls_logits[0])
    p = torch.sigmoid(logits_t).numpy()
    ce = -(tgt * np.log(p + 1e-20) + (1 - tgt) * np.log(1 - p + 1e-20))
    p_t = p * tgt + (1 - p) * (1 - tgt)
    alpha_t = 0.25 * tgt + 0.75 * (1 - tgt)
    focal = alpha_t * ((1 - p_t) ** 2) * ce
    want_cls = focal[valid_anchor].sum() / num_fg

    mb = gt[np.clip(matched, 0, None)]
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + aw / 2
    acy = anchors[:, 1] + ah / 2
    gw = mb[:, 2] - mb[:, 0]
    gh = mb[:, 3] - mb[:, 1]
    gcx = mb[:, 0] + gw / 2
    gcy = mb[:, 1] + gh / 2
    t = np.stack(
        [(gcx - acx) / aw, (gcy - acy) / ah,
         np.log(gw / aw), np.log(gh / ah)], -1)
    want_reg = np.abs(reg[0] - t).sum(-1)[fg].sum() / num_fg

    np.testing.assert_allclose(
        float(losses["classification"]), want_cls, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(losses["bbox_regression"]), want_reg, rtol=1e-5
    )


def test_fcos_loss_matches_torch_transcription():
    """FCOS training losses: center-sampling + scale-range matching to
    the min-area gt, focal over all anchors, GIoU on foreground,
    centerness BCE — vs a numpy/torch transcription of reference
    fcos.py:440 compute_loss."""
    from vision_tpu.models.detection import _utils as det_utils
    from vision_tpu.models.detection.fcos import FCOS

    rng = np.random.RandomState(7)
    num_classes, g = 4, 2
    # two levels of stride-sized anchors (stride 8 and 16)
    def grid_anchors(fh, fw, stride):
        out = []
        for yy in range(fh):
            for xx in range(fw):
                cx = xx * stride + stride / 2
                cy = yy * stride + stride / 2
                out.append([cx - stride / 2, cy - stride / 2,
                            cx + stride / 2, cy + stride / 2])
        return np.asarray(out, np.float32)

    anchors = [grid_anchors(8, 8, 8), grid_anchors(4, 4, 16)]
    n_per = [64, 16]
    gt = np.asarray([[6, 6, 40, 36], [20, 24, 60, 62]], np.float32)
    gt_labels = np.asarray([2, 1])
    logits = [rng.randn(1, n, num_classes).astype(np.float32) for n in n_per]
    reg = [np.abs(rng.randn(1, n, 4)).astype(np.float32) for n in n_per]
    ctr = [rng.randn(1, n, 1).astype(np.float32) for n in n_per]

    class _Logic:
        num_classes = 4
        box_coder = det_utils.BoxLinearCoder(normalize_by_size=True)
        center_sampling_radius = 1.5

    losses = FCOS.compute_loss(
        _Logic(),
        [jnp.asarray(x) for x in logits],
        [jnp.asarray(x) for x in reg],
        [jnp.asarray(x) for x in ctr],
        [jnp.asarray(a) for a in anchors],
        jnp.asarray(gt)[None],
        jnp.asarray(gt_labels)[None],
        jnp.ones((1, g), bool),
    )

    # ---- transcription ----
    A = np.concatenate(anchors)
    R = A.shape[0]
    sizes = A[:, 2] - A[:, 0]
    lower = sizes * 4.0
    upper = sizes * 8.0
    lower[:64] = 0.0
    upper[64:] = np.inf
    ac = (A[:, :2] + A[:, 2:]) / 2
    gc = (gt[:, :2] + gt[:, 2:]) / 2
    pm = (
        np.abs(ac[:, None] - gc[None]).max(2)
        < 1.5 * sizes[:, None]
    )
    dist = np.stack(
        [ac[:, 0:1] - gt[None, :, 0], ac[:, 1:2] - gt[None, :, 1],
         gt[None, :, 2] - ac[:, 0:1], gt[None, :, 3] - ac[:, 1:2]], 2)
    pm &= dist.min(2) > 0
    dmax = dist.max(2)
    pm &= (dmax > lower[:, None]) & (dmax < upper[:, None])
    areas = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    score = pm.astype(np.float64) * (1e8 - areas[None])
    matched = np.where(score.max(1) < 1e-5, -1, score.argmax(1))
    fg = matched >= 0
    num_fg = max(int(fg.sum()), 1)

    L = np.concatenate([x[0] for x in logits])
    Rg = np.concatenate([x[0] for x in reg])
    C = np.concatenate([x[0] for x in ctr])[:, 0]

    tgt = np.zeros((R, num_classes), np.float32)
    tgt[fg, gt_labels[np.clip(matched, 0, None)[fg]]] = 1.0
    p = 1 / (1 + np.exp(-L))
    ce = -(tgt * np.log(p + 1e-20) + (1 - tgt) * np.log(1 - p + 1e-20))
    p_t = p * tgt + (1 - p) * (1 - tgt)
    focal = (0.25 * tgt + 0.75 * (1 - tgt)) * (1 - p_t) ** 2 * ce
    want_cls = focal.sum() / num_fg

    # decode (BoxLinearCoder, normalized): pred = center -/+ rel * size
    w = sizes
    h = A[:, 3] - A[:, 1]
    rr = Rg * np.stack([w, h, w, h], -1)
    pred = np.stack(
        [ac[:, 0] - rr[:, 0], ac[:, 1] - rr[:, 1],
         ac[:, 0] + rr[:, 2], ac[:, 1] + rr[:, 3]], -1)
    gb = gt[np.clip(matched, 0, None)]

    def giou_loss(a, b):
        x1 = np.maximum(a[:, 0], b[:, 0]); y1 = np.maximum(a[:, 1], b[:, 1])
        x2 = np.minimum(a[:, 2], b[:, 2]); y2 = np.minimum(a[:, 3], b[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        union = aa + ab - inter
        iou = inter / (union + 1e-7)
        cx1 = np.minimum(a[:, 0], b[:, 0]); cy1 = np.minimum(a[:, 1], b[:, 1])
        cx2 = np.maximum(a[:, 2], b[:, 2]); cy2 = np.maximum(a[:, 3], b[:, 3])
        hull = (cx2 - cx1) * (cy2 - cy1)
        return 1 - iou + (hull - union) / (hull + 1e-7)

    want_reg = (giou_loss(pred, gb) * fg).sum() / num_fg

    # centerness targets from encoded l/t/r/b
    l_ = (ac[:, 0] - gb[:, 0]) / w
    t_ = (ac[:, 1] - gb[:, 1]) / h
    r_ = (gb[:, 2] - ac[:, 0]) / w
    b_ = (gb[:, 3] - ac[:, 1]) / h
    lr = np.stack([l_, r_], -1); tb = np.stack([t_, b_], -1)
    ctr_t = np.sqrt(np.clip(
        (lr.min(-1) / np.clip(lr.max(-1), 1e-6, None))
        * (tb.min(-1) / np.clip(tb.max(-1), 1e-6, None)), 0, None))
    bce = np.clip(C, 0, None) - C * ctr_t + np.log1p(np.exp(-np.abs(C)))
    want_ctr = (bce * fg).sum() / num_fg

    np.testing.assert_allclose(
        float(losses["classification"]), want_cls, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(losses["bbox_regression"]), want_reg, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(losses["bbox_ctrness"]), want_ctr, rtol=1e-4
    )


def test_rpn_loss_matches_torch_transcription():
    """RPN training losses with a SATURATED sampler (budget >= all
    candidate anchors makes BalancedPositiveNegativeSampler
    deterministic): Matcher(0.7, 0.3, low-quality) + BCE objectness +
    smooth-L1(beta=1/9) on positives / num_sampled, vs a numpy
    transcription of reference rpn.py:299."""
    from vision_tpu.models.detection.rpn import RegionProposalNetwork

    rng = np.random.RandomState(8)
    r, g = 40, 2
    xy = rng.uniform(4, 56, (r, 2)).astype(np.float32)
    wh = rng.uniform(8, 24, (r, 2)).astype(np.float32)
    anchors = np.concatenate([xy - wh / 2, xy + wh / 2], 1)
    gt = np.asarray([[8, 8, 30, 30], [28, 30, 56, 55]], np.float32)
    obj = rng.randn(1, r).astype(np.float32)
    deltas = (rng.randn(1, r, 4) * 0.3).astype(np.float32)

    rpn = RegionProposalNetwork(batch_size_per_image=4 * r)
    losses = rpn.compute_loss(
        [jnp.asarray(obj)],
        [jnp.asarray(deltas)],
        [jnp.asarray(anchors)],
        jnp.asarray(gt)[None],
        jnp.ones((1, g), bool),
        jax.random.PRNGKey(0),
    )

    def iou(a, b):
        x1 = np.maximum(a[:, None, 0], b[None, :, 0])
        y1 = np.maximum(a[:, None, 1], b[None, :, 1])
        x2 = np.minimum(a[:, None, 2], b[None, :, 2])
        y2 = np.minimum(a[:, None, 3], b[None, :, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (aa[:, None] + ab[None] - inter)

    m = iou(gt, anchors)
    mv, am = m.max(0), m.argmax(0)
    matched = np.where(mv < 0.3, -1, am)
    matched = np.where((mv >= 0.3) & (mv < 0.7), -2, matched)
    restore = (m == m.max(1, keepdims=True)).any(0)
    matched = np.where(restore, am, matched)

    pos = matched >= 0
    neg = matched == -1
    sampled = pos | neg  # saturated budget selects everything
    num_sampled = max(int(sampled.sum()), 1)
    labels = pos.astype(np.float32)
    o = obj[0]
    bce = np.clip(o, 0, None) - o * labels + np.log1p(np.exp(-np.abs(o)))
    want_obj = bce[sampled].sum() / num_sampled

    mb = gt[np.clip(matched, 0, None)]
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + aw / 2
    acy = anchors[:, 1] + ah / 2
    gw = mb[:, 2] - mb[:, 0]
    gh = mb[:, 3] - mb[:, 1]
    gcx = mb[:, 0] + gw / 2
    gcy = mb[:, 1] + gh / 2
    t = np.stack([(gcx - acx) / aw, (gcy - acy) / ah,
                  np.log(gw / aw), np.log(gh / ah)], -1)
    d = np.abs(deltas[0] - t)
    beta = 1.0 / 9.0
    sl1 = np.where(d < beta, 0.5 * d**2 / beta, d - 0.5 * beta).sum(-1)
    want_box = sl1[pos].sum() / num_sampled

    np.testing.assert_allclose(
        float(losses["loss_objectness"]), want_obj, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(losses["loss_rpn_box_reg"]), want_box, rtol=1e-5
    )
