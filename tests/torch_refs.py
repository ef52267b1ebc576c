"""Minimal torch reference models used as numerical oracles in tests.

These transcribe the reference architectures (torchvision is not installed
in this environment) so converted-weight outputs can be compared
end-to-end: torch model with random weights -> state_dict ->
vision_tpu._torch_convert -> flax model -> same logits.
"""

import torch
import torch.nn as nn


def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
    return nn.Conv2d(
        in_planes, out_planes, 3, stride=stride, padding=dilation,
        groups=groups, bias=False, dilation=dilation,
    )


def conv1x1(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, 1, stride=stride, bias=False)


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, groups=1,
                 base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = conv1x1(inplanes, width)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = conv3x3(width, width, stride, groups)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = conv1x1(width, planes * self.expansion)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, groups=1,
                 width_per_group=64):
        super().__init__()
        self.inplanes = 64
        self.groups = groups
        self.base_width = width_per_group
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion),
            )
        kwargs = {}
        if block is TorchBottleneck:
            kwargs = dict(groups=self.groups, base_width=self.base_width)
        layers = [block(self.inplanes, planes, stride, downsample, **kwargs)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, **kwargs))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def torch_resnet18(num_classes=10):
    return TorchResNet(TorchBasicBlock, [2, 2, 2, 2], num_classes)


def torch_resnet50(num_classes=10):
    return TorchResNet(TorchBottleneck, [3, 4, 6, 3], num_classes)


def randomize_bn_stats(model, seed=0):
    """Give BN layers nontrivial running stats so conversion is exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)
    return model


class TorchViTBlock(nn.Module):
    """torchvision EncoderBlock transcription (MultiheadAttention-based)."""

    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(dim, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential(
            nn.Linear(dim, mlp_dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(mlp_dim, dim), nn.Dropout(0.0),
        )

    def forward(self, x):
        h = self.ln_1(x)
        h, _ = self.self_attention(h, h, h, need_weights=False)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class TorchMiniViT(nn.Module):
    """Tiny torchvision-style ViT for conversion parity tests."""

    def __init__(self, image_size=32, patch=8, layers=2, heads=4, dim=64,
                 mlp_dim=128, num_classes=10):
        super().__init__()
        self.patch = patch
        self.conv_proj = nn.Conv2d(3, dim, patch, stride=patch)
        seq = (image_size // patch) ** 2 + 1
        self.class_token = nn.Parameter(torch.zeros(1, 1, dim))

        class Enc(nn.Module):
            pass

        self.encoder = Enc()
        self.encoder.pos_embedding = nn.Parameter(torch.randn(1, seq, dim) * 0.02)
        self.encoder.layers = nn.Sequential()
        for i in range(layers):
            self.encoder.layers.add_module(
                f"encoder_layer_{i}", TorchViTBlock(dim, heads, mlp_dim)
            )
        self.encoder.ln = nn.LayerNorm(dim, eps=1e-6)
        # register encoder submodules properly
        self.add_module("encoder", self.encoder)
        self.heads = nn.Sequential()
        self.heads.add_module("head", nn.Linear(dim, num_classes))

    def forward(self, x):
        x = self.conv_proj(x)  # [N, D, H', W']
        n, d, h, w = x.shape
        x = x.reshape(n, d, h * w).permute(0, 2, 1)
        x = torch.cat([self.class_token.expand(n, -1, -1), x], dim=1)
        x = x + self.encoder.pos_embedding
        for blk in self.encoder.layers:
            x = blk(x)
        x = self.encoder.ln(x)
        return self.heads.head(x[:, 0])


# ---- MobileNetV2 (reference ``mobilenetv2.py``: inverted residuals with
# ReLU6, depthwise 3x3; exercises grouped convs + BN + ReLU6 numerics) ----
class TorchInvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = int(round(inp * expand_ratio))
        self.use_res_connect = stride == 1 and inp == oup
        # mirror torchvision naming: Conv2dNormActivation children are
        # nested Sequentials (conv.N.0 = conv, conv.N.1 = bn), then the
        # project conv/bn are flat (conv.K / conv.K+1)
        layers = []
        if expand_ratio != 1:
            layers.append(
                nn.Sequential(
                    nn.Conv2d(inp, hidden, 1, bias=False),
                    nn.BatchNorm2d(hidden),
                    nn.ReLU6(inplace=True),
                )
            )
        layers.append(
            nn.Sequential(
                nn.Conv2d(
                    hidden, hidden, 3, stride, 1, groups=hidden, bias=False
                ),
                nn.BatchNorm2d(hidden),
                nn.ReLU6(inplace=True),
            )
        )
        layers += [
            nn.Conv2d(hidden, oup, 1, bias=False),
            nn.BatchNorm2d(oup),
        ]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res_connect else self.conv(x)


class TorchMobileNetV2(nn.Module):
    """Full mobilenet_v2 architecture (width 1.0) transcribed from the
    reference's layer table for numerical-parity testing."""

    def __init__(self, num_classes=10):
        super().__init__()
        cfg = [
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        features = [
            nn.Sequential(
                nn.Conv2d(3, 32, 3, 2, 1, bias=False),
                nn.BatchNorm2d(32),
                nn.ReLU6(inplace=True),
            )
        ]
        inp = 32
        for t, c, n, s in cfg:
            for i in range(n):
                features.append(
                    TorchInvertedResidual(inp, c, s if i == 0 else 1, t)
                )
                inp = c
        features.append(
            nn.Sequential(
                nn.Conv2d(inp, 1280, 1, bias=False),
                nn.BatchNorm2d(1280),
                nn.ReLU6(inplace=True),
            )
        )
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(1280, num_classes)
        )

    def forward(self, x):
        x = self.features(x)
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.classifier(x)


# ---- EfficientNet-B0 (reference ``efficientnet.py``: MBConv with SiLU +
# squeeze-excite; exercises SE gating + 5x5 depthwise + SiLU numerics) ----
class TorchSqueezeExcite(nn.Module):
    def __init__(self, input_c, squeeze_c):
        super().__init__()
        self.fc1 = nn.Conv2d(input_c, squeeze_c, 1)
        self.fc2 = nn.Conv2d(squeeze_c, input_c, 1)

    def forward(self, x):
        s = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        s = torch.nn.functional.silu(self.fc1(s))
        s = torch.sigmoid(self.fc2(s))
        return x * s


def _t_cna(inp, out, k, s=1, groups=1, act=True):
    layers = [
        nn.Conv2d(inp, out, k, s, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(out),
    ]
    if act:
        layers.append(nn.SiLU(inplace=True))
    return nn.Sequential(*layers)


class TorchEffMBConv(nn.Module):
    def __init__(self, expand, kernel, stride, inp, out):
        super().__init__()
        self.use_res = stride == 1 and inp == out
        hidden = inp * expand
        blocks = []
        if hidden != inp:
            blocks.append(_t_cna(inp, hidden, 1))
        blocks.append(_t_cna(hidden, hidden, kernel, stride, groups=hidden))
        blocks.append(TorchSqueezeExcite(hidden, max(1, inp // 4)))
        blocks.append(_t_cna(hidden, out, 1, act=False))
        self.block = nn.Sequential(*blocks)

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


class TorchEfficientNetB0(nn.Module):
    _CFG = [
        (1, 3, 1, 32, 16, 1), (6, 3, 2, 16, 24, 2), (6, 5, 2, 24, 40, 2),
        (6, 3, 2, 40, 80, 3), (6, 5, 1, 80, 112, 3), (6, 5, 2, 112, 192, 4),
        (6, 3, 1, 192, 320, 1),
    ]

    def __init__(self, num_classes=10):
        super().__init__()
        features = [_t_cna(3, 32, 3, 2)]
        for expand, k, s, inp, out, n in self._CFG:
            stage = []
            for j in range(n):
                stage.append(
                    TorchEffMBConv(
                        expand, k, s if j == 0 else 1,
                        inp if j == 0 else out, out,
                    )
                )
            features.append(nn.Sequential(*stage))
        features.append(_t_cna(320, 1280, 1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(1280, num_classes)
        )

    def forward(self, x):
        x = self.features(x)
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.classifier(x)


# ---- ShuffleNetV2 x1.0 (reference ``shufflenetv2.py``: channel shuffle is
# the most layout-sensitive op in the zoo — verifies NHWC channel-group
# semantics match torch's NCHW view/transpose trick) --------------------
def _t_channel_shuffle(x, groups):
    n, c, h, w = x.shape
    x = x.view(n, groups, c // groups, h, w)
    x = x.transpose(1, 2).contiguous()
    return x.view(n, c, h, w)


class TorchShuffleUnit(nn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        branch_features = oup // 2
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, branch_features, 1, bias=False),
                nn.BatchNorm2d(branch_features),
                nn.ReLU(inplace=True),
            )
        else:
            self.branch1 = nn.Sequential()
        in2 = inp if stride > 1 else branch_features
        self.branch2 = nn.Sequential(
            nn.Conv2d(in2, branch_features, 1, bias=False),
            nn.BatchNorm2d(branch_features),
            nn.ReLU(inplace=True),
            nn.Conv2d(branch_features, branch_features, 3, stride, 1,
                      groups=branch_features, bias=False),
            nn.BatchNorm2d(branch_features),
            nn.Conv2d(branch_features, branch_features, 1, bias=False),
            nn.BatchNorm2d(branch_features),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return _t_channel_shuffle(out, 2)


class TorchShuffleNetV2(nn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        stages_repeats = [4, 8, 4]
        out_c = [24, 116, 232, 464, 1024]
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, out_c[0], 3, 2, 1, bias=False),
            nn.BatchNorm2d(out_c[0]),
            nn.ReLU(inplace=True),
        )
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inp = out_c[0]
        for i, (reps, oup) in enumerate(zip(stages_repeats, out_c[1:4])):
            stage = [TorchShuffleUnit(inp, oup, 2)]
            for _ in range(reps - 1):
                stage.append(TorchShuffleUnit(oup, oup, 1))
            setattr(self, f"stage{i + 2}", nn.Sequential(*stage))
            inp = oup
        self.conv5 = nn.Sequential(
            nn.Conv2d(inp, out_c[-1], 1, bias=False),
            nn.BatchNorm2d(out_c[-1]),
            nn.ReLU(inplace=True),
        )
        self.fc = nn.Linear(out_c[-1], num_classes)

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        x = self.stage4(self.stage3(self.stage2(x)))
        x = self.conv5(x)
        return self.fc(x.mean([2, 3]))


# ---- r3d_18 (reference ``video/resnet.py``: 3D convolutions) -----------
class TorchBasicBlock3D(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv3d(inplanes, planes, 3, stride, 1, bias=False),
            nn.BatchNorm3d(planes),
            nn.ReLU(inplace=True),
        )
        self.conv2 = nn.Sequential(
            nn.Conv3d(planes, planes, 3, 1, 1, bias=False),
            nn.BatchNorm3d(planes),
        )
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = self.downsample(x) if self.downsample else x
        return self.relu(self.conv2(self.conv1(x)) + identity)


class TorchR3D18(nn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3), bias=False),
            nn.BatchNorm3d(64),
            nn.ReLU(inplace=True),
        )
        inplanes = 64
        for i, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if i == 0 else 2
            ds = None
            if stride != 1 or inplanes != planes:
                ds = nn.Sequential(
                    nn.Conv3d(inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm3d(planes),
                )
            blocks = [TorchBasicBlock3D(inplanes, planes, stride, ds),
                      TorchBasicBlock3D(planes, planes)]
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
            inplanes = planes
        self.avgpool = nn.AdaptiveAvgPool3d(1)
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):  # x: [N, C, T, H, W]
        x = self.stem(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(self.avgpool(x).flatten(1))


# ---- DenseNet-121 (reference ``densenet.py``: concat feature growth) ----
class TorchDenseLayer(nn.Module):
    def __init__(self, inp, growth, bn_size):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(inp)
        self.conv1 = nn.Conv2d(inp, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        out = self.conv1(torch.relu(self.norm1(x)))
        return self.conv2(torch.relu(self.norm2(out)))


class TorchDenseNet121(nn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        growth, bn_size, init = 32, 4, 64
        block_config = (6, 12, 24, 16)
        features = nn.Module()
        features.conv0 = nn.Conv2d(3, init, 7, 2, 3, bias=False)
        features.norm0 = nn.BatchNorm2d(init)
        n = init
        for i, layers in enumerate(block_config):
            block = nn.Module()
            for j in range(layers):
                setattr(
                    block, f"denselayer{j + 1}",
                    TorchDenseLayer(n + j * growth, growth, bn_size),
                )
            setattr(features, f"denseblock{i + 1}", block)
            n += layers * growth
            if i != len(block_config) - 1:
                trans = nn.Module()
                trans.norm = nn.BatchNorm2d(n)
                trans.conv = nn.Conv2d(n, n // 2, 1, bias=False)
                setattr(features, f"transition{i + 1}", trans)
                n //= 2
        features.norm5 = nn.BatchNorm2d(n)
        self.features = features
        self.classifier = nn.Linear(n, num_classes)
        self._block_config = block_config

    def forward(self, x):
        f = self.features
        x = torch.relu(f.norm0(f.conv0(x)))
        x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
        for i, layers in enumerate(self._block_config):
            block = getattr(f, f"denseblock{i + 1}")
            for j in range(layers):
                new = getattr(block, f"denselayer{j + 1}")(x)
                x = torch.cat([x, new], dim=1)
            if i != len(self._block_config) - 1:
                t = getattr(f, f"transition{i + 1}")
                x = t.conv(torch.relu(t.norm(x)))
                x = torch.nn.functional.avg_pool2d(x, 2, 2)
        x = torch.relu(f.norm5(x))
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.classifier(x)


# ---- VGG-11 (reference ``vgg.py``: plain conv stacks + 3-layer head) ----
class TorchVGG11(nn.Module):
    _CFG = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]

    def __init__(self, num_classes=10):
        super().__init__()
        layers = []
        inp = 3
        for v in self._CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(inp, v, 3, padding=1), nn.ReLU(True)]
                inp = v
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.avgpool(self.features(x)).flatten(1)
        return self.classifier(x)
