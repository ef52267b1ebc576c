"""Torch oracle transcriptions, round 2: the conversion-risky architectures
(VERDICT.md item 4). Each class is a minimal, independently-written torch
implementation whose state-dict key space mirrors the vision_tpu flax module
tree, so ``convert_torch_state_dict`` maps it mechanically. Semantics follow
the reference implementations (cited per class); code is transcribed fresh.

Covered here: Swin v1/v2 (shifted windows + rel-pos bias / cosine attention),
RegNet (grouped bottleneck + SE), MaxViT (MBConv + block/grid attention with
the feat_dim**-0.5 k-scaling quirk), GoogLeNet (aux heads), ConvNeXt
(LayerNorm2d + CNBlock layer-scale), MobileNetV3 (SE + hardswish).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------------------------------------------------ Swin --
def _rel_pos_index(wh: int, ww: int) -> torch.Tensor:
    ys, xs = torch.meshgrid(torch.arange(wh), torch.arange(ww), indexing="ij")
    flat = torch.stack([ys.reshape(-1), xs.reshape(-1)])  # 2, N
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # N, N


class TorchSwinAttention(nn.Module):
    """Shifted-window MHA w/ relative position bias
    (reference ``swin_transformer.py:116``); v2 = cosine attention + CPB MLP
    (reference ``:252``)."""

    def __init__(self, dim, window, shift, heads, v2=False):
        super().__init__()
        self.dim, self.window, self.shift, self.heads, self.v2 = (
            dim, window, shift, heads, v2,
        )
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        n = window[0] * window[1]
        self.register_buffer(
            "relative_position_index", _rel_pos_index(*window).reshape(-1)
        )
        if v2:
            self.logit_scale = nn.Parameter(
                torch.full((heads, 1, 1), math.log(10.0))
            )
            self.cpb_mlp = nn.Sequential(
                nn.Linear(2, 512), nn.ReLU(), nn.Linear(512, heads, bias=False)
            )
            ch = torch.arange(-(window[0] - 1), window[0], dtype=torch.float32)
            cw = torch.arange(-(window[1] - 1), window[1], dtype=torch.float32)
            tbl = torch.stack(torch.meshgrid(ch, cw, indexing="ij"))
            tbl = tbl.permute(1, 2, 0).unsqueeze(0)
            tbl[..., 0] /= window[0] - 1
            tbl[..., 1] /= window[1] - 1
            tbl *= 8
            tbl = torch.sign(tbl) * torch.log2(torch.abs(tbl) + 1.0) / 3.0
            self.register_buffer("relative_coords_table", tbl)
        else:
            self.relative_position_bias_table = nn.Parameter(
                torch.randn((2 * window[0] - 1) * (2 * window[1] - 1), heads)
                * 0.02
            )

    def _bias(self, n):
        if self.v2:
            tbl = self.cpb_mlp(self.relative_coords_table).view(-1, self.heads)
            bias = tbl[self.relative_position_index].view(n, n, self.heads)
            bias = bias.permute(2, 0, 1).unsqueeze(0)
            return 16.0 * torch.sigmoid(bias)
        bias = self.relative_position_bias_table[self.relative_position_index]
        return bias.view(n, n, self.heads).permute(2, 0, 1).unsqueeze(0)

    def forward(self, x):
        b, h, w, c = x.shape
        wh, ww = self.window
        pad_r = (ww - w % ww) % ww
        pad_b = (wh - h % wh) % wh
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        _, ph, pw, _ = x.shape
        sh, sw = self.shift
        if wh >= ph:
            sh = 0
        if ww >= pw:
            sw = 0
        if sh or sw:
            x = torch.roll(x, (-sh, -sw), dims=(1, 2))
        nwh, nww = ph // wh, pw // ww
        nw = nwh * nww
        n = wh * ww
        x = x.view(b, nwh, wh, nww, ww, c).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(b * nw, n, c)

        qkv_bias = self.qkv.bias
        if self.v2:
            qkv_bias = qkv_bias.clone()
            third = qkv_bias.numel() // 3
            qkv_bias[third : 2 * third] = 0
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b * nw, n, 3, self.heads, c // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.v2:
            attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(
                -2, -1
            )
            attn = attn * torch.clamp(
                self.logit_scale, max=math.log(100.0)
            ).exp()
        else:
            attn = (q * (c // self.heads) ** -0.5) @ k.transpose(-2, -1)
        attn = attn + self._bias(n)

        if sh or sw:
            mask = x.new_zeros((ph, pw))
            cnt = 0
            for hs in ((0, ph - wh), (ph - wh, ph - sh), (ph - sh, ph)):
                for wsl in ((0, pw - ww), (pw - ww, pw - sw), (pw - sw, pw)):
                    mask[hs[0] : hs[1], wsl[0] : wsl[1]] = cnt
                    cnt += 1
            mask = mask.view(nwh, wh, nww, ww).permute(0, 2, 1, 3)
            mask = mask.reshape(nw, n)
            am = mask.unsqueeze(1) - mask.unsqueeze(2)
            am = torch.where(am != 0, -100.0, 0.0)
            attn = attn.view(b, nw, self.heads, n, n) + am[None, :, None]
            attn = attn.view(-1, self.heads, n, n)

        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b * nw, n, c)
        out = self.proj(out)
        out = out.view(b, nwh, nww, wh, ww, c).permute(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, ph, pw, c)
        if sh or sw:
            out = torch.roll(out, (sh, sw), dims=(1, 2))
        return out[:, :h, :w, :]


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift, mlp_ratio, v2=False):
        super().__init__()
        self.v2 = v2
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = TorchSwinAttention(dim, window, shift, heads, v2=v2)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential(
            nn.Linear(dim, hidden),
            nn.GELU(),
            nn.Identity(),
            nn.Linear(hidden, dim),
        )

    def forward(self, x):
        if self.v2:  # post-norm residuals (reference SwinTransformerBlockV2)
            x = x + self.norm1(self.attn(x))
            x = x + self.norm2(self.mlp(x))
        else:
            x = x + self.attn(self.norm1(x))
            x = x + self.mlp(self.norm2(x))
        return x


class TorchPatchMerging(nn.Module):
    def __init__(self, dim, v2=False):
        super().__init__()
        self.v2 = v2
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim if v2 else 4 * dim, eps=1e-5)

    def forward(self, x):
        h, w = x.shape[1], x.shape[2]
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat(
            [
                x[:, 0::2, 0::2, :],
                x[:, 1::2, 0::2, :],
                x[:, 0::2, 1::2, :],
                x[:, 1::2, 1::2, :],
            ],
            dim=-1,
        )
        if self.v2:
            return self.norm(self.reduction(x))
        return self.reduction(self.norm(x))


class _NCHWtoNHWC(nn.Module):
    def forward(self, x):
        return x.permute(0, 2, 3, 1)


class TorchMiniSwin(nn.Module):
    """Mini Swin (v1/v2) with the reference's module-key layout
    (``features.{L}.{i}.attn.qkv`` etc.) for converter parity tests."""

    def __init__(
        self,
        patch=2,
        embed=16,
        depths=(2, 2),
        heads=(2, 4),
        window=(4, 4),
        mlp_ratio=2.0,
        num_classes=10,
        v2=False,
    ):
        super().__init__()
        layers = [
            nn.Sequential(
                nn.Conv2d(3, embed, patch, patch),
                _NCHWtoNHWC(),
                nn.LayerNorm(embed, eps=1e-5),
            )
        ]
        for i_stage, depth in enumerate(depths):
            dim = embed * 2**i_stage
            blocks = []
            for i in range(depth):
                shift = (
                    (0, 0)
                    if i % 2 == 0
                    else (window[0] // 2, window[1] // 2)
                )
                blocks.append(
                    TorchSwinBlock(
                        dim, heads[i_stage], window, shift, mlp_ratio, v2=v2
                    )
                )
            layers.append(nn.Sequential(*blocks))
            if i_stage < len(depths) - 1:
                layers.append(TorchPatchMerging(dim, v2=v2))
        self.features = nn.Sequential(*layers)
        final = embed * 2 ** (len(depths) - 1)
        self.norm = nn.LayerNorm(final, eps=1e-5)
        self.head = nn.Linear(final, num_classes)

    def forward(self, x):
        x = self.features(x)
        x = self.norm(x)
        x = x.mean(dim=(1, 2))
        return self.head(x)


# ---------------------------------------------------------------- RegNet --
class TorchRegSE(nn.Module):
    def __init__(self, in_ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(in_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, in_ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


def _cna(in_ch, out_ch, k, stride=1, groups=1, act=True):
    mods = [
        nn.Conv2d(
            in_ch, out_ch, k, stride, (k - 1) // 2, groups=groups, bias=False
        ),
        nn.BatchNorm2d(out_ch),
    ]
    if act:
        mods.append(nn.ReLU())
    return nn.Sequential(*mods)


class TorchRegBottleneck(nn.Module):
    """reference ``regnet.py`` ResBottleneckBlock."""

    def __init__(self, w_in, w_out, stride, group_width, bm, se_ratio):
        super().__init__()
        w_b = int(round(w_out * bm))
        g = w_b // group_width
        f = nn.Module()
        f.a = _cna(w_in, w_b, 1)
        f.b = _cna(w_b, w_b, 3, stride, groups=g)
        if se_ratio:
            f.se = TorchRegSE(w_b, int(round(se_ratio * w_in)))
        f.c = _cna(w_b, w_out, 1, act=False)
        self.f = f
        self.se_ratio = se_ratio
        if w_in != w_out or stride != 1:
            self.proj = _cna(w_in, w_out, 1, stride, act=False)
        else:
            self.proj = None

    def forward(self, x):
        out = self.f.b(self.f.a(x))
        if self.se_ratio:
            out = self.f.se(out)
        out = self.f.c(out)
        identity = self.proj(x) if self.proj is not None else x
        return F.relu(identity + out)


class TorchMiniRegNet(nn.Module):
    """Mini RegNet-Y: stem + 2 stages, reference key layout
    (``trunk_output.block{i}.block{i}-{j}``)."""

    def __init__(
        self,
        stem_width=8,
        stage_params=((16, 2, 1, 8, 1.0), (24, 2, 2, 8, 1.0)),
        se_ratio=0.25,
        num_classes=10,
    ):
        super().__init__()
        self.stem = _cna(3, stem_width, 3, 2)
        self.trunk_output = nn.Module()
        current = stem_width
        for i, (w_out, stride, depth, gw, bm) in enumerate(stage_params):
            stage = nn.Module()
            for j in range(depth):
                stage.add_module(
                    f"block{i + 1}-{j}",
                    TorchRegBottleneck(
                        current if j == 0 else w_out,
                        w_out,
                        stride if j == 0 else 1,
                        gw,
                        bm,
                        se_ratio,
                    ),
                )
            self.trunk_output.add_module(f"block{i + 1}", stage)
            current = w_out
        self.fc = nn.Linear(current, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for stage in self.trunk_output.children():
            for block in stage.children():
                x = block(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


# ---------------------------------------------------------------- MaxViT --
class TorchMaxVitSE(nn.Module):
    def __init__(self, ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = self.fc2(F.silu(self.fc1(s)))
        return x * torch.sigmoid(s)


class TorchMaxVitMBConv(nn.Module):
    """reference ``maxvit.py:54``: pre-norm MBConv, SE, avg-pool shortcut."""

    def __init__(self, in_ch, out_ch, expansion, squeeze, stride):
        super().__init__()
        self.stride = stride
        mid = int(out_ch * expansion)
        sqz = int(out_ch * squeeze)
        self.should_proj = stride != 1 or in_ch != out_ch
        if self.should_proj:
            self.proj = nn.Module()
            if stride == 2:
                self.proj.add_module("1", nn.Conv2d(in_ch, out_ch, 1))
            else:
                self.proj.add_module("0", nn.Conv2d(in_ch, out_ch, 1))
        layers = nn.Module()
        layers.pre_norm = nn.BatchNorm2d(in_ch, eps=1e-3, momentum=0.01)
        layers.conv_a = nn.Sequential(
            nn.Conv2d(in_ch, mid, 1, bias=False),
            nn.BatchNorm2d(mid, eps=1e-3, momentum=0.01),
        )
        layers.conv_b = nn.Sequential(
            nn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False),
            nn.BatchNorm2d(mid, eps=1e-3, momentum=0.01),
        )
        layers.squeeze_excitation = TorchMaxVitSE(mid, sqz)
        layers.conv_c = nn.Conv2d(mid, out_ch, 1)
        self.layers = layers

    def forward(self, x):
        if self.should_proj:
            if self.stride == 2:
                # reference MBConv uses nn.AvgPool2d(3, 2, 1) with the
                # torch default count_include_pad=True (maxvit.py:87)
                res = F.avg_pool2d(x, 3, 2, padding=1)
                res = getattr(self.proj, "1")(res)
            else:
                res = getattr(self.proj, "0")(x)
        else:
            res = x
        out = self.layers.pre_norm(x)
        out = F.gelu(self.layers.conv_a(out))
        out = F.gelu(self.layers.conv_b(out))
        out = self.layers.squeeze_excitation(out)
        out = self.layers.conv_c(out)
        return res + out


class TorchRelPosAttention(nn.Module):
    """reference ``maxvit.py:141`` — note the feat_dim**-0.5 k scaling."""

    def __init__(self, feat_dim, head_dim, seq_len):
        super().__init__()
        self.heads = feat_dim // head_dim
        self.head_dim = head_dim
        self.seq_len = seq_len
        size = int(math.sqrt(seq_len))
        self.to_qkv = nn.Linear(feat_dim, 3 * feat_dim)
        self.merge = nn.Linear(feat_dim, feat_dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * size - 1) * (2 * size - 1), self.heads) * 0.02
        )
        self.register_buffer(
            "relative_position_index", _rel_pos_index(size, size).reshape(-1)
        )
        self.scale = feat_dim**-0.5

    def forward(self, x):
        b, g, p, d = x.shape
        qkv = self.to_qkv(x)
        q, k, v = torch.chunk(qkv, 3, dim=-1)

        def heads(t):
            return t.reshape(b, g, p, self.heads, self.head_dim).permute(
                0, 1, 3, 2, 4
            )

        q, k, v = heads(q), heads(k) * self.scale, heads(v)
        attn = torch.einsum("bghid,bghjd->bghij", q, k)
        bias = self.relative_position_bias_table[self.relative_position_index]
        bias = bias.view(self.seq_len, self.seq_len, self.heads)
        bias = bias.permute(2, 0, 1)[None, None]
        attn = torch.softmax(attn + bias, dim=-1)
        out = torch.einsum("bghij,bghjd->bghid", attn, v)
        out = out.permute(0, 1, 3, 2, 4).reshape(b, g, p, d)
        return self.merge(out)


class TorchPartitionAttention(nn.Module):
    def __init__(self, dim, head_dim, partition_size, grid, mlp_ratio):
        super().__init__()
        self.ps = partition_size
        self.grid = grid
        self.attn_layer = nn.Sequential(
            nn.LayerNorm(dim, eps=1e-5),
            TorchRelPosAttention(dim, head_dim, partition_size**2),
        )
        self.mlp_layer = nn.Sequential(
            nn.LayerNorm(dim, eps=1e-5),
            nn.Linear(dim, dim * mlp_ratio),
            nn.GELU(),
            nn.Linear(dim * mlp_ratio, dim),
        )

    def forward(self, x):  # NHWC
        b, h, w, c = x.shape
        p = self.ps if not self.grid else h // self.ps
        gh, gw = h // p, w // p
        t = x.reshape(b, gh, p, gw, p, c).permute(0, 1, 3, 2, 4, 5)
        t = t.reshape(b, gh * gw, p * p, c)
        if self.grid:
            t = t.swapaxes(-2, -3)
        t = t + self.attn_layer(t)
        t = t + self.mlp_layer(t)
        if self.grid:
            t = t.swapaxes(-2, -3)
        t = t.reshape(b, gh, gw, p, p, c).permute(0, 1, 3, 2, 4, 5)
        return t.reshape(b, h, w, c)


class TorchMiniMaxVit(nn.Module):
    """Mini MaxViT with reference key layout
    (``blocks.{bi}.layers.{li}.layers.{MBconv,window_attention,grid_attention}``)."""

    def __init__(
        self,
        stem=8,
        channels=(8, 16),
        n_layers=(1, 1),
        head_dim=4,
        partition_size=2,
        mlp_ratio=2,
        num_classes=10,
    ):
        super().__init__()
        stem_mod = nn.Module()
        stem_mod.add_module(
            "0",
            nn.Sequential(
                nn.Conv2d(3, stem, 3, 2, 1, bias=False),
                nn.BatchNorm2d(stem, eps=1e-3, momentum=0.01),
            ),
        )
        stem_mod.add_module(
            "1", nn.Sequential(nn.Conv2d(stem, stem, 3, 1, 1))
        )
        self.stem = stem_mod
        self.blocks = nn.ModuleList()
        in_ch = stem
        for out_ch, n in zip(channels, n_layers):
            block = nn.Module()
            layer_list = nn.ModuleList()
            for li in range(n):
                stride = 2 if li == 0 else 1
                entry = nn.Module()
                sub = nn.Module()
                sub.MBconv = TorchMaxVitMBConv(
                    in_ch if li == 0 else out_ch, out_ch, 4.0, 0.25, stride
                )
                sub.window_attention = TorchPartitionAttention(
                    out_ch, head_dim, partition_size, False, mlp_ratio
                )
                sub.grid_attention = TorchPartitionAttention(
                    out_ch, head_dim, partition_size, True, mlp_ratio
                )
                entry.layers = sub
                layer_list.append(entry)
            block.layers = layer_list
            self.blocks.append(block)
            in_ch = out_ch
        self.classifier = nn.Module()
        self.classifier.add_module(
            "2", nn.LayerNorm(channels[-1], eps=1e-5)
        )
        self.classifier.add_module(
            "3", nn.Linear(channels[-1], channels[-1])
        )
        self.classifier.add_module(
            "5", nn.Linear(channels[-1], num_classes, bias=False)
        )

    def forward(self, x):
        x = self.stem._modules["1"](F.gelu(self.stem._modules["0"](x)))
        x = x.permute(0, 2, 3, 1)  # NHWC for attention; convs run NCHW below
        for block in self.blocks:
            for entry in block.layers:
                x = x.permute(0, 3, 1, 2)
                x = entry.layers.MBconv(x)
                x = x.permute(0, 2, 3, 1)
                x = entry.layers.window_attention(x)
                x = entry.layers.grid_attention(x)
        x = x.mean(dim=(1, 2))
        x = getattr(self.classifier, "2")(x)
        x = torch.tanh(getattr(self.classifier, "3")(x))
        return getattr(self.classifier, "5")(x)


# ------------------------------------------------------------- GoogLeNet --
class TorchBasicConv2d(nn.Module):
    def __init__(self, in_ch, out_ch, k=1, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride, padding, bias=False)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchInceptionBlock(nn.Module):
    """GoogLeNet Inception module (reference ``googlenet.py``; note branch3
    uses kernel 3, the reference's known quirk)."""

    def __init__(self, in_ch, c1, c3r, c3, c5r, c5, pp):
        super().__init__()
        self.branch1 = TorchBasicConv2d(in_ch, c1)
        self.branch2 = nn.Sequential(
            TorchBasicConv2d(in_ch, c3r), TorchBasicConv2d(c3r, c3, 3, padding=1)
        )
        self.branch3 = nn.Sequential(
            TorchBasicConv2d(in_ch, c5r), TorchBasicConv2d(c5r, c5, 3, padding=1)
        )
        self.branch4 = nn.Sequential(
            nn.MaxPool2d(3, 1, padding=1, ceil_mode=True),
            TorchBasicConv2d(in_ch, pp),
        )

    def forward(self, x):
        return torch.cat(
            [self.branch1(x), self.branch2(x), self.branch3(x), self.branch4(x)],
            dim=1,
        )


class TorchGoogLeNetAux(nn.Module):
    def __init__(self, in_ch, num_classes):
        super().__init__()
        self.conv = TorchBasicConv2d(in_ch, 128)
        self.fc1 = nn.Linear(128 * 4 * 4, 1024)
        self.fc2 = nn.Linear(1024, num_classes)

    def forward(self, x):
        x = F.adaptive_avg_pool2d(x, (4, 4))
        x = self.conv(x)
        x = torch.flatten(x, 1)
        x = F.relu(self.fc1(x))
        return self.fc2(x)


class TorchGoogLeNet(nn.Module):
    """Full GoogLeNet with aux heads (reference ``googlenet.py:26``)."""

    def __init__(self, num_classes=10, aux_logits=True):
        super().__init__()
        self.aux_logits = aux_logits
        self.conv1 = TorchBasicConv2d(3, 64, 7, 2, 3)
        self.conv2 = TorchBasicConv2d(64, 64, 1)
        self.conv3 = TorchBasicConv2d(64, 192, 3, padding=1)
        self.inception3a = TorchInceptionBlock(192, 64, 96, 128, 16, 32, 32)
        self.inception3b = TorchInceptionBlock(256, 128, 128, 192, 32, 96, 64)
        self.inception4a = TorchInceptionBlock(480, 192, 96, 208, 16, 48, 64)
        self.inception4b = TorchInceptionBlock(512, 160, 112, 224, 24, 64, 64)
        self.inception4c = TorchInceptionBlock(512, 128, 128, 256, 24, 64, 64)
        self.inception4d = TorchInceptionBlock(512, 112, 144, 288, 32, 64, 64)
        self.inception4e = TorchInceptionBlock(528, 256, 160, 320, 32, 128, 128)
        self.inception5a = TorchInceptionBlock(832, 256, 160, 320, 32, 128, 128)
        self.inception5b = TorchInceptionBlock(832, 384, 192, 384, 48, 128, 128)
        if aux_logits:
            self.aux1 = TorchGoogLeNetAux(512, num_classes)
            self.aux2 = TorchGoogLeNetAux(528, num_classes)
        self.fc = nn.Linear(1024, num_classes)

    def forward(self, x):
        mp = lambda t, k, s: F.max_pool2d(t, k, s, ceil_mode=True)
        x = mp(self.conv1(x), 3, 2)
        x = mp(self.conv3(self.conv2(x)), 3, 2)
        x = mp(self.inception3b(self.inception3a(x)), 3, 2)
        x = self.inception4a(x)
        aux1 = self.aux1(x) if (self.aux_logits and self.training) else None
        x = self.inception4d(self.inception4c(self.inception4b(x)))
        aux2 = self.aux2(x) if (self.aux_logits and self.training) else None
        x = mp(self.inception4e(x), 2, 2)
        x = self.inception5b(self.inception5a(x))
        x = x.mean(dim=(2, 3))
        logits = self.fc(x)
        if self.aux_logits and self.training:
            return logits, aux2, aux1
        return logits


# -------------------------------------------------------------- ConvNeXt --
class TorchCNBlock(nn.Module):
    """reference ``convnext.py`` CNBlock: dwconv7 -> LN -> MLP, layer scale;
    key layout block.0/2/3/5 + layer_scale."""

    def __init__(self, dim, layer_scale=1e-6):
        super().__init__()
        self.layer_scale = nn.Parameter(torch.full((dim, 1, 1), layer_scale))
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim),
            nn.Identity(),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
        )

    def forward(self, x):  # NCHW
        out = self.block[0](x).permute(0, 2, 3, 1)
        out = self.block[2](out)
        out = self.block[5](F.gelu(self.block[3](out)))
        out = out.permute(0, 3, 1, 2)
        return x + self.layer_scale * out


class TorchMiniConvNeXt(nn.Module):
    def __init__(self, dims=(16, 32), depths=(2, 2), num_classes=10):
        super().__init__()
        layers = [
            nn.Sequential(
                nn.Conv2d(3, dims[0], 4, 4),
                _LayerNorm2d(dims[0]),
            )
        ]
        for i, (dim, depth) in enumerate(zip(dims, depths)):
            layers.append(
                nn.Sequential(*[TorchCNBlock(dim) for _ in range(depth)])
            )
            if i < len(dims) - 1:
                layers.append(
                    nn.Sequential(
                        _LayerNorm2d(dim), nn.Conv2d(dim, dims[i + 1], 2, 2)
                    )
                )
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.LayerNorm(dims[-1], eps=1e-6),
            nn.Identity(),
            nn.Linear(dims[-1], num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = x.mean(dim=(2, 3))
        return self.classifier[2](self.classifier[0](x))


class _LayerNorm2d(nn.LayerNorm):
    def __init__(self, dim):
        super().__init__(dim, eps=1e-6)

    def forward(self, x):  # NCHW
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


# ----------------------------------------------------------- MobileNetV3 --
def _t_make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class TorchSEHardsigmoid(nn.Module):
    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = self.fc2(F.relu(self.fc1(s)))
        return x * F.hardsigmoid(s)


def _t_cna_v3(in_ch, out_ch, k, stride=1, groups=1, act="relu", dilation=1):
    pad = (k - 1) // 2 * dilation
    mods = [
        nn.Conv2d(
            in_ch, out_ch, k, stride, pad, dilation=dilation, groups=groups,
            bias=False,
        ),
        nn.BatchNorm2d(out_ch),
    ]
    if act == "relu":
        mods.append(nn.ReLU())
    elif act == "hardswish":
        mods.append(nn.Hardswish())
    return nn.Sequential(*mods)


class TorchIRBlockV3(nn.Module):
    """reference ``mobilenetv3.py:56`` InvertedResidual."""

    def __init__(self, inp, k, exp, out, use_se, use_hs, stride, dilation=1):
        super().__init__()
        act = "hardswish" if use_hs else "relu"
        self.use_res = stride == 1 and inp == out
        mods = []
        if exp != inp:
            mods.append(_t_cna_v3(inp, exp, 1, act=act))
        s = 1 if dilation > 1 else stride
        mods.append(_t_cna_v3(exp, exp, k, s, groups=exp, act=act, dilation=dilation))
        if use_se:
            mods.append(TorchSEHardsigmoid(exp, _t_make_divisible(exp // 4)))
        mods.append(_t_cna_v3(exp, out, 1, act=None))
        self.block = nn.Sequential(*mods)

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


class TorchMiniMobileNetV3(nn.Module):
    """Mini MobileNetV3: SE + hardswish/hardsigmoid + expand-skip block."""

    CFG = [
        # inp, k, exp, out, se, hs, stride
        (8, 3, 8, 8, False, False, 1),
        (8, 3, 24, 12, False, True, 2),
        (12, 5, 36, 12, True, True, 1),
    ]

    def __init__(self, num_classes=10, last_channel=32):
        super().__init__()
        layers = [_t_cna_v3(3, 8, 3, 2, act="hardswish")]
        for cfg in self.CFG:
            layers.append(TorchIRBlockV3(*cfg))
        lastconv = 6 * self.CFG[-1][3]
        layers.append(_t_cna_v3(self.CFG[-1][3], lastconv, 1, act="hardswish"))
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Linear(lastconv, last_channel),
            nn.Hardswish(),
            nn.Identity(),
            nn.Linear(last_channel, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = x.mean(dim=(2, 3))
        return self.classifier(x)


# ------------------------------------------------------------------ RAFT --
def torch_grid_sample_abs(img, absolute_grid, align_corners=True):
    """grid_sample with absolute pixel coords (reference
    ``optical_flow/_utils.py:8``)."""
    h, w = img.shape[-2:]
    xg, yg = absolute_grid.split([1, 1], dim=-1)
    xg = 2 * xg / (w - 1) - 1
    if h > 1:
        yg = 2 * yg / (h - 1) - 1
    grid = torch.cat([xg, yg], dim=-1)
    return F.grid_sample(img, grid, mode="bilinear", align_corners=align_corners)


class TorchCorrBlock:
    """reference ``raft.py:337``: correlation pyramid build + index.
    Channel order of the neighborhood is (di-major, dj), with the offset
    applied as (x+di, y+dj) — the reference adds the (di, dj) delta straight
    onto (x, y) centroids."""

    def __init__(self, num_levels=2, radius=2):
        self.num_levels = num_levels
        self.radius = radius
        self.out_channels = num_levels * (2 * radius + 1) ** 2

    def build_pyramid(self, fmap1, fmap2):  # NCHW
        b, c, h, w = fmap1.shape
        f1 = fmap1.view(b, c, h * w)
        f2 = fmap2.view(b, c, h * w)
        corr = torch.matmul(f1.transpose(1, 2), f2) / math.sqrt(c)
        vol = corr.view(b * h * w, 1, h, w)
        self.pyramid = [vol]
        for _ in range(self.num_levels - 1):
            vol = F.avg_pool2d(vol, 2, 2)
            self.pyramid.append(vol)

    def index_pyramid(self, coords):  # coords NCHW (2, x/y)
        r = self.radius
        side = 2 * r + 1
        di = torch.linspace(-r, r, side)
        dj = torch.linspace(-r, r, side)
        delta = torch.stack(torch.meshgrid(di, dj, indexing="ij"), dim=-1)
        delta = delta.view(1, side, side, 2)
        b, _, h, w = coords.shape
        c = coords.permute(0, 2, 3, 1).reshape(b * h * w, 1, 1, 2)
        out = []
        for vol in self.pyramid:
            sampled = torch_grid_sample_abs(vol, c + delta, align_corners=True)
            out.append(sampled.view(b, h, w, -1))
            c = c / 2
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


def _t_convrelu(in_ch, out_ch, k, stride=1):
    return nn.Sequential(
        nn.Conv2d(in_ch, out_ch, k, stride, (k - 1) // 2)
    )


class TorchMotionEncoder(nn.Module):
    """reference ``raft.py:171`` (mini widths)."""

    def __init__(self, in_corr, corr_layers=(16, 12), flow_layers=(8, 4), out=16):
        super().__init__()
        self.convcorr1 = _t_convrelu(in_corr, corr_layers[0], 1)
        self.convcorr2 = _t_convrelu(corr_layers[0], corr_layers[1], 3)
        self.convflow1 = _t_convrelu(2, flow_layers[0], 7)
        self.convflow2 = _t_convrelu(flow_layers[0], flow_layers[1], 3)
        self.conv = _t_convrelu(corr_layers[1] + flow_layers[1], out - 2, 3)

    def forward(self, flow, corr):
        corr = F.relu(self.convcorr1(corr))
        corr = F.relu(self.convcorr2(corr))
        f = F.relu(self.convflow1(flow))
        f = F.relu(self.convflow2(f))
        cf = F.relu(self.conv(torch.cat([corr, f], dim=1)))
        return torch.cat([cf, flow], dim=1)


class TorchConvGRU(nn.Module):
    def __init__(self, hidden, in_ch, kernel):
        super().__init__()
        kh, kw = kernel
        pad = ((kh - 1) // 2, (kw - 1) // 2)
        self.convz = nn.Conv2d(hidden + in_ch, hidden, kernel, padding=pad)
        self.convr = nn.Conv2d(hidden + in_ch, hidden, kernel, padding=pad)
        self.convq = nn.Conv2d(hidden + in_ch, hidden, kernel, padding=pad)

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class TorchUpdateBlock(nn.Module):
    """Mini RAFT update block (reference ``raft.py:288``): motion encoder +
    two-pass ConvGRU (1x5 then 5x1) + flow head."""

    def __init__(self, in_corr, hidden=16, context=16, motion_out=16,
                 flow_head_hidden=24):
        super().__init__()
        self.motion_encoder = TorchMotionEncoder(in_corr, out=motion_out)
        rb = nn.Module()
        rb.convgru1 = TorchConvGRU(hidden, context + motion_out, (1, 5))
        rb.convgru2 = TorchConvGRU(hidden, context + motion_out, (5, 1))
        self.recurrent_block = rb
        fh = nn.Module()
        fh.conv1 = nn.Conv2d(hidden, flow_head_hidden, 3, padding=1)
        fh.conv2 = nn.Conv2d(flow_head_hidden, 2, 3, padding=1)
        self.flow_head = fh

    def forward(self, h, context, corr, flow):
        motion = self.motion_encoder(flow, corr)
        x = torch.cat([context, motion], dim=1)
        h = self.recurrent_block.convgru1(h, x)
        h = self.recurrent_block.convgru2(h, x)
        d = F.relu(self.flow_head.conv1(h))
        return h, self.flow_head.conv2(d)


# -------------------------------------------------- Detection RPN slice --
class TorchRPNHead(nn.Module):
    """reference ``rpn.py:15``: conv tower (key conv.{i}.0) + 1x1 heads."""

    def __init__(self, in_ch, num_anchors, conv_depth=1):
        super().__init__()
        self.conv = nn.Sequential(
            *[
                nn.Sequential(nn.Conv2d(in_ch, in_ch, 3, padding=1))
                for _ in range(conv_depth)
            ]
        )
        self.cls_logits = nn.Conv2d(in_ch, num_anchors, 1)
        self.bbox_pred = nn.Conv2d(in_ch, num_anchors * 4, 1)

    def forward(self, features):
        objectness, deltas = [], []
        for f in features:
            t = f
            for c in self.conv:
                t = F.relu(c(t))
            objectness.append(self.cls_logits(t))
            deltas.append(self.bbox_pred(t))
        return objectness, deltas


def torch_decode_boxes(deltas, anchors, weights=(1.0, 1.0, 1.0, 1.0),
                       clip=math.log(1000.0 / 16)):
    """reference ``detection/_utils.py`` decode_single."""
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights
    dx = deltas[:, 0] / weights[0]
    dy = deltas[:, 1] / weights[1]
    dw = torch.clamp(deltas[:, 2] / weights[2], max=clip)
    dh = torch.clamp(deltas[:, 3] / weights[3], max=clip)
    cx = dx * widths + ctr_x
    cy = dy * heights + ctr_y
    w = torch.exp(dw) * widths
    h = torch.exp(dh) * heights
    return torch.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], dim=1
    )


def torch_filter_proposals(
    objectness_levels,
    deltas_levels,
    anchors_levels,
    image_size,
    pre_nms_top_n=60,
    post_nms_top_n=40,
    nms_thresh=0.7,
    min_size=1e-3,
):
    """Dynamic-shape transcription of reference ``rpn.py:242``
    filter_proposals for ONE image: per-level top-k -> decode -> clip ->
    remove-small -> cross-level NMS (level id as class) -> top-n.
    Returns (boxes, scores) score-descending."""
    import numpy as np

    boxes_all, scores_all, lvl_all = [], [], []
    for lvl, (obj, dl, anch) in enumerate(
        zip(objectness_levels, deltas_levels, anchors_levels)
    ):
        k = min(pre_nms_top_n, obj.numel())
        top_scores, top_idx = obj.topk(k)
        dec = torch_decode_boxes(dl[top_idx], anch[top_idx])
        dec[:, 0::2] = dec[:, 0::2].clamp(0, image_size[1])
        dec[:, 1::2] = dec[:, 1::2].clamp(0, image_size[0])
        keep = (dec[:, 2] - dec[:, 0] >= min_size) & (
            dec[:, 3] - dec[:, 1] >= min_size
        )
        boxes_all.append(dec[keep])
        scores_all.append(torch.sigmoid(top_scores[keep]))
        lvl_all.append(torch.full((int(keep.sum()),), lvl))
    boxes = torch.cat(boxes_all).numpy()
    scores = torch.cat(scores_all).numpy()
    lvls = torch.cat(lvl_all).numpy()

    # greedy NMS, same-level suppression only (== batched_nms)
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep_idx = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep_idx.append(i)
        same = lvls == lvls[i]
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / (areas + areas[i] - inter)
        suppressed |= same & (iou > nms_thresh)
        suppressed[i] = False
    keep_idx = np.asarray(keep_idx[:post_nms_top_n])
    return boxes[keep_idx], scores[keep_idx]


# ---------------------------------------------------------- Inception v3 --
class TorchIncBasicConv(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, stride, padding, bias=False)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchIncA(nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TorchIncBasicConv(in_ch, 64, 1)
        self.branch5x5_1 = TorchIncBasicConv(in_ch, 48, 1)
        self.branch5x5_2 = TorchIncBasicConv(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = TorchIncBasicConv(in_ch, 64, 1)
        self.branch3x3dbl_2 = TorchIncBasicConv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TorchIncBasicConv(96, 96, 3, padding=1)
        self.branch_pool = TorchIncBasicConv(in_ch, pool_features, 1)

    def forward(self, x):
        return torch.cat(
            [
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(F.avg_pool2d(x, 3, 1, 1)),
            ],
            1,
        )


class TorchIncB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TorchIncBasicConv(in_ch, 384, 3, 2)
        self.branch3x3dbl_1 = TorchIncBasicConv(in_ch, 64, 1)
        self.branch3x3dbl_2 = TorchIncBasicConv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TorchIncBasicConv(96, 96, 3, 2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, 2),
            ],
            1,
        )


class TorchIncC(nn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = TorchIncBasicConv(in_ch, 192, 1)
        self.branch7x7_1 = TorchIncBasicConv(in_ch, c7, 1)
        self.branch7x7_2 = TorchIncBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = TorchIncBasicConv(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TorchIncBasicConv(in_ch, c7, 1)
        self.branch7x7dbl_2 = TorchIncBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TorchIncBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TorchIncBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TorchIncBasicConv(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = TorchIncBasicConv(in_ch, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        return torch.cat(
            [
                self.branch1x1(x),
                b7,
                bd,
                self.branch_pool(F.avg_pool2d(x, 3, 1, 1)),
            ],
            1,
        )


class TorchIncD(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TorchIncBasicConv(in_ch, 192, 1)
        self.branch3x3_2 = TorchIncBasicConv(192, 320, 3, 2)
        self.branch7x7x3_1 = TorchIncBasicConv(in_ch, 192, 1)
        self.branch7x7x3_2 = TorchIncBasicConv(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TorchIncBasicConv(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TorchIncBasicConv(192, 192, 3, 2)

    def forward(self, x):
        b7 = self.branch7x7x3_2(self.branch7x7x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(b7))
        return torch.cat(
            [
                self.branch3x3_2(self.branch3x3_1(x)),
                b7,
                F.max_pool2d(x, 3, 2),
            ],
            1,
        )


class TorchIncE(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = TorchIncBasicConv(in_ch, 320, 1)
        self.branch3x3_1 = TorchIncBasicConv(in_ch, 384, 1)
        self.branch3x3_2a = TorchIncBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = TorchIncBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TorchIncBasicConv(in_ch, 448, 1)
        self.branch3x3dbl_2 = TorchIncBasicConv(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = TorchIncBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TorchIncBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = TorchIncBasicConv(in_ch, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        return torch.cat(
            [
                self.branch1x1(x),
                b3,
                bd,
                self.branch_pool(F.avg_pool2d(x, 3, 1, 1)),
            ],
            1,
        )


class TorchIncAux(nn.Module):
    def __init__(self, in_ch, num_classes):
        super().__init__()
        self.conv0 = TorchIncBasicConv(in_ch, 128, 1)
        self.conv1 = TorchIncBasicConv(128, 768, 5)
        self.fc = nn.Linear(768, num_classes)

    def forward(self, x):
        x = F.avg_pool2d(x, 5, 3)
        x = self.conv1(self.conv0(x))
        return self.fc(x.mean(dim=(2, 3)))


class TorchInception3(nn.Module):
    """Full Inception v3 (reference ``inception.py:28``), 299x299 input."""

    def __init__(self, num_classes=10, aux_logits=True):
        super().__init__()
        self.aux_logits = aux_logits
        self.Conv2d_1a_3x3 = TorchIncBasicConv(3, 32, 3, 2)
        self.Conv2d_2a_3x3 = TorchIncBasicConv(32, 32, 3)
        self.Conv2d_2b_3x3 = TorchIncBasicConv(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = TorchIncBasicConv(64, 80, 1)
        self.Conv2d_4a_3x3 = TorchIncBasicConv(80, 192, 3)
        self.Mixed_5b = TorchIncA(192, 32)
        self.Mixed_5c = TorchIncA(256, 64)
        self.Mixed_5d = TorchIncA(288, 64)
        self.Mixed_6a = TorchIncB(288)
        self.Mixed_6b = TorchIncC(768, 128)
        self.Mixed_6c = TorchIncC(768, 160)
        self.Mixed_6d = TorchIncC(768, 160)
        self.Mixed_6e = TorchIncC(768, 192)
        if aux_logits:
            self.AuxLogits = TorchIncAux(768, num_classes)
        self.Mixed_7a = TorchIncD(768)
        self.Mixed_7b = TorchIncE(1280)
        self.Mixed_7c = TorchIncE(2048)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(self.Mixed_6a(x)))))
        aux = (
            self.AuxLogits(x) if (self.aux_logits and self.training) else None
        )
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        logits = self.fc(x.mean(dim=(2, 3)))
        if self.aux_logits and self.training:
            return logits, aux
        return logits


# --------------------------------------------------------------- MNASNet --
class TorchMnasIR(nn.Module):
    def __init__(self, in_ch, out_ch, k, stride, expansion):
        super().__init__()
        mid = in_ch * expansion
        self.apply_res = in_ch == out_ch and stride == 1
        self.layers = nn.Sequential(
            nn.Conv2d(in_ch, mid, 1, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(),
            nn.Conv2d(mid, mid, k, stride, k // 2, groups=mid, bias=False),
            nn.BatchNorm2d(mid),
            nn.ReLU(),
            nn.Conv2d(mid, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch),
        )

    def forward(self, x):
        out = self.layers(x)
        return out + x if self.apply_res else out


class TorchMNASNet(nn.Module):
    """MNASNet 1.0 (reference ``mnasnet.py``): flat ``layers.N`` key space."""

    def __init__(self, num_classes=10):
        super().__init__()
        d = [32, 16, 24, 40, 80, 96, 192, 320]
        mods = [
            nn.Conv2d(3, d[0], 3, 2, 1, bias=False),
            nn.BatchNorm2d(d[0]),
            nn.ReLU(),
            nn.Conv2d(d[0], d[0], 3, 1, 1, groups=d[0], bias=False),
            nn.BatchNorm2d(d[0]),
            nn.ReLU(),
            nn.Conv2d(d[0], d[1], 1, bias=False),
            nn.BatchNorm2d(d[1]),
        ]
        stacks = [
            (d[1], d[2], 3, 2, 3, 3),
            (d[2], d[3], 5, 2, 3, 3),
            (d[3], d[4], 5, 2, 6, 3),
            (d[4], d[5], 3, 1, 6, 2),
            (d[5], d[6], 5, 2, 6, 4),
            (d[6], d[7], 3, 1, 6, 1),
        ]
        for ic, oc, k, s, e, r in stacks:
            stack = [TorchMnasIR(ic, oc, k, s, e)]
            stack += [TorchMnasIR(oc, oc, k, 1, e) for _ in range(r - 1)]
            mods.append(nn.Sequential(*stack))
        mods += [
            nn.Conv2d(d[7], 1280, 1, bias=False),
            nn.BatchNorm2d(1280),
            nn.ReLU(),
        ]
        self.layers = nn.Sequential(*mods)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(1280, num_classes)
        )

    def forward(self, x):
        x = self.layers(x)
        return self.classifier(x.mean(dim=(2, 3)))


# ------------------------------------------------------------- SqueezeNet --
class TorchFire(nn.Module):
    def __init__(self, in_ch, s, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(in_ch, s, 1)
        self.expand1x1 = nn.Conv2d(s, e1, 1)
        self.expand3x3 = nn.Conv2d(s, e3, 3, padding=1)

    def forward(self, x):
        x = F.relu(self.squeeze(x))
        return torch.cat(
            [F.relu(self.expand1x1(x)), F.relu(self.expand3x3(x))], 1
        )


class TorchSqueezeNet11(nn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 3, 2),
            nn.ReLU(),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            TorchFire(64, 16, 64, 64),
            TorchFire(128, 16, 64, 64),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            TorchFire(128, 32, 128, 128),
            TorchFire(256, 32, 128, 128),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            TorchFire(256, 48, 192, 192),
            TorchFire(384, 48, 192, 192),
            TorchFire(384, 64, 256, 256),
            TorchFire(512, 64, 256, 256),
        )
        self.classifier = nn.Sequential(
            nn.Dropout(0.5), nn.Conv2d(512, num_classes, 1), nn.ReLU()
        )

    def forward(self, x):
        x = self.classifier(self.features(x))
        return x.mean(dim=(2, 3))


# ---------------------------------------------------------------- AlexNet --
class TorchAlexNet(nn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2),
            nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2),
            nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(384, 256, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1),
            nn.ReLU(),
            nn.MaxPool2d(3, 2),
        )
        self.classifier = nn.Sequential(
            nn.Dropout(),
            nn.Linear(256 * 6 * 6, 4096),
            nn.ReLU(),
            nn.Dropout(),
            nn.Linear(4096, 4096),
            nn.ReLU(),
            nn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = F.adaptive_avg_pool2d(x, (6, 6))
        return self.classifier(torch.flatten(x, 1))


# ---------------------------------------------------- Segmentation heads --
class TorchASPPConv(nn.Sequential):
    def __init__(self, in_ch, out_ch, dilation):
        super().__init__(
            nn.Conv2d(in_ch, out_ch, 3, padding=dilation, dilation=dilation,
                      bias=False),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(),
        )


class TorchASPPPooling(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        # child indices 1/2 match the reference's Sequential(pool, conv, bn, relu)
        self.add_module("1", nn.Conv2d(in_ch, out_ch, 1, bias=False))
        self.add_module("2", nn.BatchNorm2d(out_ch))

    def forward(self, x):
        size = x.shape[-2:]
        y = x.mean(dim=(2, 3), keepdim=True)
        y = F.relu(getattr(self, "2")(getattr(self, "1")(y)))
        return y.expand(-1, -1, size[0], size[1])


class TorchASPP(nn.Module):
    """reference ``deeplabv3.py:85``."""

    def __init__(self, in_ch, rates, out_ch=256):
        super().__init__()
        mods = [
            nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, bias=False),
                nn.BatchNorm2d(out_ch),
                nn.ReLU(),
            )
        ]
        mods += [TorchASPPConv(in_ch, out_ch, r) for r in rates]
        mods.append(TorchASPPPooling(in_ch, out_ch))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(out_ch * len(mods), out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(),
            nn.Dropout(0.5),
        )

    def forward(self, x):
        return self.project(torch.cat([m(x) for m in self.convs], dim=1))


class TorchDeepLabHead(nn.Module):
    """reference ``deeplabv3.py:49``: key layout 0 (ASPP) / 1 / 2 / 4."""

    def __init__(self, in_ch, num_classes, rates=(12, 24, 36)):
        super().__init__()
        self.add_module("0", TorchASPP(in_ch, rates))
        self.add_module("1", nn.Conv2d(256, 256, 3, padding=1, bias=False))
        self.add_module("2", nn.BatchNorm2d(256))
        self.add_module("4", nn.Conv2d(256, num_classes, 1))

    def forward(self, x):
        x = getattr(self, "0")(x)
        x = F.relu(getattr(self, "2")(getattr(self, "1")(x)))
        return getattr(self, "4")(x)


class TorchFCNHead(nn.Module):
    """reference ``fcn.py:36``: key layout 0 / 1 / 4."""

    def __init__(self, in_ch, num_classes):
        super().__init__()
        inter = in_ch // 4
        self.add_module("0", nn.Conv2d(in_ch, inter, 3, padding=1, bias=False))
        self.add_module("1", nn.BatchNorm2d(inter))
        self.add_module("4", nn.Conv2d(inter, num_classes, 1))

    def forward(self, x):
        x = F.relu(getattr(self, "1")(getattr(self, "0")(x)))
        return getattr(self, "4")(x)


# ------------------------------------------------- MViT pooled attention --
class TorchMViTPool(nn.Module):
    """reference ``video/mvit.py:65`` Pool: depthwise conv3d over spatial
    tokens (class token bypass) + LN. Key layout: pool / norm_act.0."""

    def __init__(self, head_dim, kernel, stride):
        super().__init__()
        padding = [k // 2 for k in kernel]
        self.pool = nn.Conv3d(
            head_dim, head_dim, kernel, stride=stride, padding=padding,
            groups=head_dim, bias=False,
        )
        self.norm_act = nn.Sequential(nn.LayerNorm(head_dim, eps=1e-6))

    def forward(self, x, thw):
        # x: [B, H, N+1, D]
        cls, tok = torch.tensor_split(x, indices=(1,), dim=2)
        b, h = tok.shape[:2]
        d = tok.shape[-1]
        tok = tok.transpose(2, 3).reshape((b * h, d) + thw)
        tok = self.pool(tok)
        t, hh, ww = tok.shape[2:]
        tok = tok.reshape(b, h, d, -1).transpose(2, 3)
        out = torch.cat([cls, tok], dim=2)
        return self.norm_act(out), (t, hh, ww)


class TorchMultiscaleAttention(nn.Module):
    """reference ``video/mvit.py:196`` (mini config, rel-pos + pooling)."""

    def __init__(self, thw, embed_dim, output_dim, heads, kernel_q, stride_q,
                 kernel_kv, stride_kv, residual_pool=True,
                 residual_with_cls_embed=False, rel_pos_embed=True):
        super().__init__()
        self.heads = heads
        self.head_dim = output_dim // heads
        self.output_dim = output_dim
        self.scaler = 1.0 / math.sqrt(self.head_dim)
        self.residual_pool = residual_pool
        self.residual_with_cls_embed = residual_with_cls_embed
        self.qkv = nn.Linear(embed_dim, 3 * output_dim)
        self.project = nn.Sequential(nn.Linear(output_dim, output_dim))
        self.pool_q = (
            TorchMViTPool(self.head_dim, kernel_q, stride_q)
            if math.prod(kernel_q) > 1 or math.prod(stride_q) > 1
            else None
        )
        if math.prod(kernel_kv) > 1 or math.prod(stride_kv) > 1:
            self.pool_k = TorchMViTPool(self.head_dim, kernel_kv, stride_kv)
            self.pool_v = TorchMViTPool(self.head_dim, kernel_kv, stride_kv)
        else:
            self.pool_k = self.pool_v = None
        if rel_pos_embed:
            size = max(thw[1:])
            q_size = size // stride_q[1]
            kv_size = size // stride_kv[1]
            spatial = 2 * max(q_size, kv_size) - 1
            temporal = 2 * thw[0] - 1
            self.rel_pos_h = nn.Parameter(torch.randn(spatial, self.head_dim) * 0.02)
            self.rel_pos_w = nn.Parameter(torch.randn(spatial, self.head_dim) * 0.02)
            self.rel_pos_t = nn.Parameter(torch.randn(temporal, self.head_dim) * 0.02)
        else:
            self.rel_pos_h = None

    def _rel_pos(self, attn, q, q_thw, k_thw):
        q_t, q_h, q_w = q_thw
        k_t, k_h, k_w = k_thw

        def dist(qs, ks):
            qr = max(ks / qs, 1.0)
            kr = max(qs / ks, 1.0)
            return (
                torch.arange(qs)[:, None] * qr
                - (torch.arange(ks)[None, :] + (1.0 - ks)) * kr
            ).long()

        def interp(emb, d):
            if emb.shape[0] == d:
                return emb
            return (
                F.interpolate(
                    emb.permute(1, 0).unsqueeze(0), size=d, mode="linear"
                ).squeeze(0).permute(1, 0)
            )

        rh = interp(self.rel_pos_h, 2 * max(q_h, k_h) - 1)[dist(q_h, k_h)]
        rw = interp(self.rel_pos_w, 2 * max(q_w, k_w) - 1)[dist(q_w, k_w)]
        rt = interp(self.rel_pos_t, 2 * max(q_t, k_t) - 1)[dist(q_t, k_t)]
        b, n_head, _, dim = q.shape
        r_q = q[:, :, 1:].reshape(b, n_head, q_t, q_h, q_w, dim)
        rel_h = torch.einsum("bythwc,hkc->bythwk", r_q, rh)
        rel_w = torch.einsum("bythwc,wkc->bythwk", r_q, rw)
        r_qt = r_q.permute(2, 0, 1, 3, 4, 5).reshape(q_t, -1, dim)
        rel_t = torch.matmul(r_qt, rt.transpose(1, 2)).transpose(0, 1)
        rel_t = rel_t.view(b, n_head, q_h, q_w, q_t, k_t).permute(0, 1, 4, 2, 3, 5)
        rel = (
            rel_h[:, :, :, :, :, None, :, None]
            + rel_w[:, :, :, :, :, None, None, :]
            + rel_t[:, :, :, :, :, :, None, None]
        ).reshape(b, n_head, q_t * q_h * q_w, k_t * k_h * k_w)
        attn = attn.clone()
        attn[:, :, 1:, 1:] += rel
        return attn

    def forward(self, x, thw):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, self.head_dim)
        q, k, v = qkv.transpose(1, 3).unbind(dim=2)
        k_thw = thw
        if self.pool_k is not None:
            k, k_thw = self.pool_k(k, thw)
            v = self.pool_v(v, thw)[0]
        q_thw = thw
        if self.pool_q is not None:
            q, q_thw = self.pool_q(q, thw)
        attn = torch.matmul(self.scaler * q, k.transpose(2, 3))
        if self.rel_pos_h is not None:
            attn = self._rel_pos(attn, q, q_thw, k_thw)
        attn = attn.softmax(dim=-1)
        out = torch.matmul(attn, v)
        if self.residual_pool:
            if self.residual_with_cls_embed:
                out = out + q
            else:
                out = out.clone()
                out[:, :, 1:] += q[:, :, 1:]
        out = out.transpose(1, 2).reshape(b, -1, self.output_dim)
        return self.project(out), q_thw


# ------------------------------------------- Two-stage box branch (e2e) --
# Minimal transcriptions of the reference RoIHeads inference path
# (torchvision/models/detection/roi_heads.py:504-887 + ops/poolers.py):
# MultiScaleRoIAlign level assignment, TwoMLPHead, FastRCNNPredictor and
# postprocess_detections, all dynamic-shape like the original.


class TorchTwoMLPHead(nn.Module):
    """reference faster_rcnn.py TwoMLPHead (CHW flatten -> fc6 -> fc7)."""

    def __init__(self, in_features, representation_size):
        super().__init__()
        self.fc6 = nn.Linear(in_features, representation_size)
        self.fc7 = nn.Linear(representation_size, representation_size)

    def forward(self, x):  # x: [K, C, PH, PW]
        x = x.flatten(start_dim=1)
        x = torch.relu(self.fc6(x))
        return torch.relu(self.fc7(x))


class TorchFastRCNNPredictor(nn.Module):
    """reference faster_rcnn.py FastRCNNPredictor."""

    def __init__(self, in_channels, num_classes):
        super().__init__()
        self.cls_score = nn.Linear(in_channels, num_classes)
        self.bbox_pred = nn.Linear(in_channels, num_classes * 4)

    def forward(self, x):
        return self.cls_score(x), self.bbox_pred(x)


def torch_multiscale_roi_align(
    feats_nhwc, boxes, image_size, out_size=(7, 7), sampling_ratio=2,
    canonical_scale=224, canonical_level=4,
):
    """reference ops/poolers.py:147-229 (_multiscale_roi_align) for one
    image: LevelMapper FPN-paper assignment then per-level roi_align
    (aligned=False CUDA semantics, via the slow numpy reference)."""
    import numpy as np

    from tests.test_ops_reference import _roi_align_ref

    feats_nhwc = [f[None] if f.ndim == 3 else f for f in feats_nhwc]
    scales = [f.shape[1] / float(image_size[0]) for f in feats_nhwc]
    lvl_min = int(-np.log2(scales[0]))
    lvl_max = int(-np.log2(scales[-1]))
    area = np.clip(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 0, None
    )
    # reference poolers.py:47-86: floor(k0 + log2(sqrt(area)/s0 + eps))
    lvls = np.floor(
        canonical_level + np.log2(np.sqrt(area) / canonical_scale + 1e-6)
    )
    lvls = np.clip(lvls, lvl_min, lvl_max).astype(np.int64) - lvl_min
    rois = np.concatenate(
        [np.zeros((len(boxes), 1), np.float32), boxes], axis=1
    )
    K, C = len(boxes), feats_nhwc[0].shape[-1]
    out = np.zeros((K, out_size[0], out_size[1], C))
    for lvl, (feat, scale) in enumerate(zip(feats_nhwc, scales)):
        sel = lvls == lvl
        if not sel.any():
            continue
        out[sel] = _roi_align_ref(
            feat, rois[sel], out_size, scale, sampling_ratio, False
        )
    return out  # [K, PH, PW, C] NHWC


def torch_postprocess_detections(
    class_logits, box_regression, proposals, image_size,
    score_thresh=0.05, nms_thresh=0.5, detections_per_img=100,
    reg_weights=(10.0, 10.0, 5.0, 5.0),
):
    """reference roi_heads.py:680 postprocess_detections for one image.
    Returns (boxes, scores, labels) score-descending."""
    import numpy as np

    num_classes = class_logits.shape[1]
    scores = torch.softmax(class_logits, -1)
    reg = box_regression.reshape(-1, num_classes, 4)
    boxes = torch.stack(
        [
            torch_decode_boxes(reg[:, c], proposals, weights=reg_weights)
            for c in range(num_classes)
        ],
        dim=1,
    )  # [P, C, 4]
    boxes[..., 0::2] = boxes[..., 0::2].clamp(0, image_size[1])
    boxes[..., 1::2] = boxes[..., 1::2].clamp(0, image_size[0])

    # drop background, flatten
    boxes = boxes[:, 1:].reshape(-1, 4).numpy()
    scores = scores[:, 1:].reshape(-1).numpy()
    labels = np.tile(np.arange(1, num_classes), class_logits.shape[0])

    keep = scores > score_thresh
    ws, hs = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
    keep &= (ws >= 1e-2) & (hs >= 1e-2)
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]

    # per-class greedy NMS (batched_nms), then top detections_per_img
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep_idx = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep_idx.append(i)
        same = labels == labels[i]
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / (areas + areas[i] - inter)
        suppressed |= same & (iou > nms_thresh)
        suppressed[i] = False
    keep_idx = np.asarray(keep_idx[:detections_per_img])
    return boxes[keep_idx], scores[keep_idx], labels[keep_idx]


# ------------------------------------------- Swin3D window attention --


def torch_shifted_window_attention_3d(
    x, qkv_w, qkv_b, proj_w, proj_b, bias_table, window, shift, heads,
):
    """Transcription of reference video/swin_transformer.py
    shifted_window_attention_3d for one (B, T, H, W, C) input: window
    shrink-adjust, pad, cyclic shift, per-window attention with 3D
    relative position bias and the shifted-window mask, unshift, crop."""
    import numpy as np

    b, t, h, w, c = x.shape
    ws, ss = list(window), list(shift)
    for i, size in enumerate((t, h, w)):
        if size <= ws[i]:
            ws[i] = size
            ss[i] = 0
    wd, wh, ww = ws
    n = wd * wh * ww

    # reference _get_relative_position_bias: the index matrix is built
    # over the FULL window and SUBSET [:n, :n] when the window shrank
    # (row-major prefix of positions), video/swin_transformer.py:47-57
    coords = np.stack(
        np.meshgrid(
            np.arange(window[0]), np.arange(window[1]),
            np.arange(window[2]), indexing="ij",
        )
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window[0] - 1
    rel[:, :, 1] += window[1] - 1
    rel[:, :, 2] += window[2] - 1
    rel[:, :, 0] *= (2 * window[1] - 1) * (2 * window[2] - 1)
    rel[:, :, 1] *= 2 * window[2] - 1
    idx = torch.from_numpy(rel.sum(-1)[:n, :n].reshape(-1))
    bias = bias_table[idx].reshape(n, n, heads).permute(2, 0, 1)

    pt, ph, pw = (-t) % wd, (-h) % wh, (-w) % ww
    xp = torch.nn.functional.pad(x, (0, 0, 0, pw, 0, ph, 0, pt))
    tp, hp, wp = t + pt, h + ph, w + pw
    if sum(ss) > 0:
        xp = torch.roll(xp, (-ss[0], -ss[1], -ss[2]), dims=(1, 2, 3))

    nt, nh, nw = tp // wd, hp // wh, wp // ww
    num_win = nt * nh * nw
    xw = xp.reshape(b, nt, wd, nh, wh, nw, ww, c)
    xw = xw.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(b * num_win, n, c)

    qkv = torch.nn.functional.linear(xw, qkv_w, qkv_b)
    qkv = qkv.reshape(xw.shape[0], n, 3, heads, c // heads)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (c // heads) ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1) + bias[None]

    if sum(ss) > 0:
        mask = torch.zeros((tp, hp, wp))
        cnt = 0
        sl = [
            ((0, size - wsz), (size - wsz, size - s_), (size - s_, size))
            for size, wsz, s_ in zip((tp, hp, wp), ws, ss)
        ]
        for sd in sl[0]:
            for sh in sl[1]:
                for sw in sl[2]:
                    mask[sd[0]:sd[1], sh[0]:sh[1], sw[0]:sw[1]] = cnt
                    cnt += 1
        m = mask.reshape(nt, wd, nh, wh, nw, ww)
        m = m.permute(0, 2, 4, 1, 3, 5).reshape(num_win, n)
        am = m.unsqueeze(1) - m.unsqueeze(2)
        am = torch.where(
            am != 0, torch.tensor(-100.0), torch.tensor(0.0)
        )
        attn = attn.reshape(b, num_win, heads, n, n)
        attn = attn + am[None, :, None]
        attn = attn.reshape(-1, heads, n, n)

    attn = attn.softmax(-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(xw.shape[0], n, c)
    out = torch.nn.functional.linear(out, proj_w, proj_b)
    out = out.reshape(b, nt, nh, nw, wd, wh, ww, c)
    out = out.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
    if sum(ss) > 0:
        out = torch.roll(out, (ss[0], ss[1], ss[2]), dims=(1, 2, 3))
    return out[:, :t, :h, :w, :]


# -------------------------------------- RetinaNet postprocess (1-stage) --


def torch_retinanet_postprocess(
    cls_logits_levels, reg_levels, anchors_levels, image_size,
    score_thresh=0.05, nms_thresh=0.5, topk_candidates=1000,
    detections_per_img=300,
):
    """Dynamic transcription of reference retinanet.py:509
    postprocess_detections for one image: per-level sigmoid -> score
    filter -> top-k -> decode(weights 1,1,1,1) -> clip, then cross-level
    per-class greedy NMS and top detections_per_img."""
    import numpy as np

    boxes_all, scores_all, labels_all = [], [], []
    for logits, reg, anch in zip(
        cls_logits_levels, reg_levels, anchors_levels
    ):
        num_classes = logits.shape[-1]
        scores = torch.sigmoid(logits).flatten()
        keep = scores > score_thresh
        scores = scores[keep]
        idxs = torch.where(keep)[0]
        k = min(topk_candidates, idxs.numel())
        scores, order = scores.topk(k)
        idxs = idxs[order]
        anchor_idx = torch.div(idxs, num_classes, rounding_mode="floor")
        labels = idxs % num_classes
        dec = torch_decode_boxes(reg[anchor_idx], anch[anchor_idx])
        dec[:, 0::2] = dec[:, 0::2].clamp(0, image_size[1])
        dec[:, 1::2] = dec[:, 1::2].clamp(0, image_size[0])
        boxes_all.append(dec)
        scores_all.append(scores)
        labels_all.append(labels)

    boxes = torch.cat(boxes_all).numpy()
    scores = torch.cat(scores_all).numpy()
    labels = torch.cat(labels_all).numpy()

    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep_idx = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep_idx.append(i)
        same = labels == labels[i]
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / (areas + areas[i] - inter)
        suppressed |= same & (iou > nms_thresh)
        suppressed[i] = False
    keep_idx = np.asarray(keep_idx[:detections_per_img])
    return boxes[keep_idx], scores[keep_idx], labels[keep_idx]


# ----------------------------------------------- SSD postprocess --------


def torch_ssd_postprocess(
    cls_logits, reg, anchors, image_size, score_thresh=0.01,
    nms_thresh=0.45, topk_candidates=400, detections_per_img=200,
):
    """Dynamic transcription of reference ssd.py postprocess_detections
    for one image: softmax -> decode(weights 10,10,5,5) -> clip ->
    per-class score filter + top-k -> cross-class batched NMS -> top
    detections_per_img."""
    import numpy as np

    num_classes = cls_logits.shape[-1]
    scores = torch.softmax(cls_logits, -1)
    dec = torch_decode_boxes(
        reg, anchors, weights=(10.0, 10.0, 5.0, 5.0)
    )
    dec[:, 0::2] = dec[:, 0::2].clamp(0, image_size[1])
    dec[:, 1::2] = dec[:, 1::2].clamp(0, image_size[0])

    boxes_all, scores_all, labels_all = [], [], []
    for cls in range(1, num_classes):
        s = scores[:, cls]
        keep = s > score_thresh
        s = s[keep]
        b = dec[keep]
        k = min(topk_candidates, s.numel())
        s, order = s.topk(k)
        boxes_all.append(b[order])
        scores_all.append(s)
        labels_all.append(torch.full((k,), cls))
    boxes = torch.cat(boxes_all).numpy()
    sc = torch.cat(scores_all).numpy()
    labels = torch.cat(labels_all).numpy()

    order = np.argsort(-sc, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep_idx = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep_idx.append(i)
        same = labels == labels[i]
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / (areas + areas[i] - inter)
        suppressed |= same & (iou > nms_thresh)
        suppressed[i] = False
    keep_idx = np.asarray(keep_idx[:detections_per_img])
    return boxes[keep_idx], sc[keep_idx], labels[keep_idx]


# ----------------------------------------------- FCOS postprocess -------


def torch_fcos_postprocess(
    logits_levels, reg_levels, ctr_levels, anchors_levels, image_size,
    score_thresh=0.2, nms_thresh=0.6, topk_candidates=100,
    detections_per_img=50,
):
    """Dynamic transcription of reference fcos.py postprocess:
    score = sqrt(sigmoid(cls)*sigmoid(ctr)), per-level top-k,
    BoxLinearCoder decode (l,t,r,b normalized by anchor size), clip,
    cross-level class-aware NMS."""
    import numpy as np

    boxes_all, scores_all, labels_all = [], [], []
    for lg, rg, ct, anch in zip(
        logits_levels, reg_levels, ctr_levels, anchors_levels
    ):
        c = lg.shape[-1]
        scores = torch.sqrt(
            torch.sigmoid(lg) * torch.sigmoid(ct)
        ).flatten()
        keep = scores > score_thresh
        scores = scores[keep]
        idxs = torch.where(keep)[0]
        k = min(topk_candidates, idxs.numel())
        scores, order = scores.topk(k)
        idxs = idxs[order]
        anchor_idx = torch.div(idxs, c, rounding_mode="floor")
        labels = idxs % c
        a = anch[anchor_idx]
        r = rg[anchor_idx]
        cx = (a[:, 0] + a[:, 2]) / 2
        cy = (a[:, 1] + a[:, 3]) / 2
        w = a[:, 2] - a[:, 0]
        h = a[:, 3] - a[:, 1]
        r = r * torch.stack([w, h, w, h], -1)
        dec = torch.stack(
            [cx - r[:, 0], cy - r[:, 1], cx + r[:, 2], cy + r[:, 3]], -1
        )
        dec[:, 0::2] = dec[:, 0::2].clamp(0, image_size[1])
        dec[:, 1::2] = dec[:, 1::2].clamp(0, image_size[0])
        boxes_all.append(dec)
        scores_all.append(scores)
        labels_all.append(labels)
    boxes = torch.cat(boxes_all).numpy()
    sc = torch.cat(scores_all).numpy()
    labels = torch.cat(labels_all).numpy()
    order = np.argsort(-sc, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep_idx = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep_idx.append(i)
        same = labels == labels[i]
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        iou = inter / (areas + areas[i] - inter)
        suppressed |= same & (iou > nms_thresh)
        suppressed[i] = False
    keep_idx = np.asarray(keep_idx[:detections_per_img])
    return boxes[keep_idx], sc[keep_idx], labels[keep_idx]
