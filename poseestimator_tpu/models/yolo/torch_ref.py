"""Pure-PyTorch YOLO11-seg twin for full-network numerical parity checks.

The reference consumes a fine-tuned Ultralytics checkpoint (Detector.py:35,
detection_utils.py:22-29); its "bit-comparable boxes" contract can only be
proven by running the *same* weights through an independent torch assembly of
the YOLO11-seg graph and through the flax stack (model.py) and comparing
boxes / class scores / mask coefficients end-to-end. ``ultralytics`` is not
installed here (by design), so this module assembles the public YOLO11
architecture from primitive ``torch.nn`` layers, with ``state_dict`` keys in
the exact Ultralytics ``model.{i}.{...}`` layout so that

* a real ``best.pt`` state_dict loads into it with ``strict=True``, and
* its own randomly initialized state_dict imports into the flax model via
  ``weights.state_dict_to_variables`` (the production import path).

Structure and hyperparameters mirror model.py / layers.py (which in turn
follow the public YOLO11 architecture); this file intentionally contains no
JAX so the two stacks share nothing but the checkpoint.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from .model import SCALES, make_divisible


def _autopad(k: int) -> int:
    return k // 2


class Conv(nn.Module):
    """Conv2d(bias=False) + BatchNorm2d(eps 1e-3, momentum 0.03) + SiLU."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, _autopad(k), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0])
        self.cv2 = Conv(c_, c2, k[1])
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C3k(nn.Module):
    def __init__(self, c1, c2, n=2, shortcut=True, e=0.5, k=3):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c1, c_, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, (k, k), 1.0) for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k2(nn.Module):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut) if c3k
            else Bottleneck(self.c, self.c, shortcut, (3, 3), 0.5)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).split((self.c, self.c), 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        h = dim + self.key_dim * 2 * num_heads
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        out = (v @ attn.transpose(-2, -1)).view(B, C, H, W)
        out = out + self.pe(v.reshape(B, C, H, W))
        return self.proj(out)


class PSABlock(nn.Module):
    def __init__(self, c, num_heads):
        super().__init__()
        self.attn = Attention(c, num_heads)
        self.ffn = nn.Sequential(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.ffn(x)


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(
            *(PSABlock(self.c, max(self.c // 64, 1)) for _ in range(n))
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        return self.cv2(torch.cat((a, self.m(b)), 1))


class Proto(nn.Module):
    def __init__(self, c1, c_, c2):
        super().__init__()
        self.cv1 = Conv(c1, c_, 3)
        self.upsample = nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = Conv(c_, c_, 3)
        self.cv3 = Conv(c_, c2, 1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class DFL(nn.Module):
    """Constant conv computing the softmax bin expectation (frozen)."""

    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float32).view(
            1, c1, 1, 1
        )
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
        ).view(b, 4, a)


class Segment(nn.Module):
    """YOLO11 Segment head (Detect + proto), non-legacy cls branch."""

    def __init__(self, nc, nm, npr, ch, reg_max=16, strides=(8, 16, 32)):
        super().__init__()
        self.nc, self.nm, self.reg_max = nc, nm, reg_max
        self.strides = strides
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        c4 = max(ch[0] // 4, nm)
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1))
            for x in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(Conv(x, x, 3, g=x), Conv(x, c3, 1)),
                nn.Sequential(Conv(c3, c3, 3, g=c3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1),
            )
            for x in ch
        )
        self.cv4 = nn.ModuleList(
            nn.Sequential(Conv(x, c4, 3), Conv(c4, c4, 3), nn.Conv2d(c4, nm, 1))
            for x in ch
        )
        self.proto = Proto(ch[0], npr, nm)
        self.dfl = DFL(reg_max)

    def forward(self, feats):
        boxes = [cv(f) for cv, f in zip(self.cv2, feats)]
        classes = [cv(f) for cv, f in zip(self.cv3, feats)]
        coeffs = [cv(f) for cv, f in zip(self.cv4, feats)]
        proto = self.proto(feats[0])
        return boxes, classes, coeffs, proto


class YOLO11SegTorch(nn.Module):
    """Full YOLO11-seg graph; ``state_dict`` keys match Ultralytics'
    ``model.{0..23}`` numbering (parameterless Upsample/Identity fill the
    non-parametric slots 11/12/14/15/18/21)."""

    def __init__(self, nc=80, scale="n", reg_max=16, nm=32, npr=256):
        super().__init__()
        depth, width, max_ch = SCALES[scale]

        def c(x):
            return make_divisible(min(x, max_ch) * width)

        def n(x):
            return max(round(x * depth), 1)

        full = scale in ("m", "l", "x")
        self.nc, self.reg_max, self.nm = nc, reg_max, nm
        m = [
            Conv(3, c(64), 3, 2),                          # 0  P1/2
            Conv(c(64), c(128), 3, 2),                     # 1  P2/4
            C3k2(c(128), c(256), n(2), full, 0.25),        # 2
            Conv(c(256), c(256), 3, 2),                    # 3  P3/8
            C3k2(c(256), c(512), n(2), full, 0.25),        # 4
            Conv(c(512), c(512), 3, 2),                    # 5  P4/16
            C3k2(c(512), c(512), n(2), True, 0.5),         # 6
            Conv(c(512), c(1024), 3, 2),                   # 7  P5/32
            C3k2(c(1024), c(1024), n(2), True, 0.5),       # 8
            SPPF(c(1024), c(1024), 5),                     # 9
            C2PSA(c(1024), c(1024), n(2)),                 # 10
            nn.Upsample(scale_factor=2, mode="nearest"),   # 11
            nn.Identity(),                                  # 12 concat [-1, 6]
            C3k2(c(1024) + c(512), c(512), n(2), full, 0.5),  # 13
            nn.Upsample(scale_factor=2, mode="nearest"),   # 14
            nn.Identity(),                                  # 15 concat [-1, 4]
            C3k2(c(512) + c(512), c(256), n(2), full, 0.5),   # 16 P3
            Conv(c(256), c(256), 3, 2),                    # 17
            nn.Identity(),                                  # 18 concat [-1, 13]
            C3k2(c(256) + c(512), c(512), n(2), full, 0.5),   # 19 P4
            Conv(c(512), c(512), 3, 2),                    # 20
            nn.Identity(),                                  # 21 concat [-1, 10]
            C3k2(c(512) + c(1024), c(1024), n(2), True, 0.5),  # 22 P5
            Segment(nc, nm, c(npr), (c(256), c(512), c(1024)), reg_max),  # 23
        ]
        self.model = nn.ModuleList(m)

    def forward(self, x):
        """NCHW image batch -> (boxes, classes, coeffs, proto) raw per-level."""
        m = self.model
        x = m[2](m[1](m[0](x)))
        x4 = m[4](m[3](x))
        x6 = m[6](m[5](x4))
        x10 = m[10](m[9](m[8](m[7](x6))))
        x13 = m[13](torch.cat((m[11](x10), x6), 1))
        p3 = m[16](torch.cat((m[14](x13), x4), 1))
        p4 = m[19](torch.cat((m[17](p3), x13), 1))
        p5 = m[22](torch.cat((m[20](p4), x10), 1))
        return m[23]((p3, p4, p5))


def decode_boxes_torch(boxes, classes, coeffs, strides=(8, 16, 32), reg_max=16):
    """Raw per-level head outputs (NCHW) -> (boxes_xyxy_px (B, A, 4),
    cls_prob (B, A, nc), mask_coeffs (B, A, nm)); the Ultralytics inference
    decode (anchor centers +0.5, DFL softmax expectation, stride scaling),
    written in torch so decode parity vs decode.py is independently checked."""
    B = boxes[0].shape[0]
    anchors, stride_pa = [], []
    for b, s in zip(boxes, strides):
        _, _, H, W = b.shape
        ys, xs = torch.meshgrid(
            torch.arange(H, dtype=torch.float32) + 0.5,
            torch.arange(W, dtype=torch.float32) + 0.5,
            indexing="ij",
        )
        anchors.append(torch.stack((xs.reshape(-1), ys.reshape(-1)), -1))
        stride_pa.append(torch.full((H * W,), float(s)))
    anchors = torch.cat(anchors)          # (A, 2)
    stride_pa = torch.cat(stride_pa)      # (A,)

    def flat(xs):
        return torch.cat([x.flatten(2).transpose(1, 2) for x in xs], 1)

    box_flat = flat(boxes)                # (B, A, 4*reg_max)
    dist = (
        box_flat.view(B, -1, 4, reg_max).softmax(-1)
        * torch.arange(reg_max, dtype=torch.float32)
    ).sum(-1)
    xy1 = anchors[None] - dist[..., :2]
    xy2 = anchors[None] + dist[..., 2:]
    out_boxes = torch.cat((xy1, xy2), -1) * stride_pa[None, :, None]
    cls_prob = flat(classes).sigmoid()
    mc = flat(coeffs)
    return out_boxes, cls_prob, mc
