"""From-spec torch implementation of ``lpips.LPIPS(net='alex', version='0.1')``.

The reference builds its perceptual loss from the pip ``lpips`` package
(reference src/face_simple/training.py:76); that package (and torchvision)
is not installed here, so the JAX port (speech2lip_tpu/models/lpips.py)
could previously be verified only by construction.  This module is an
independent PyTorch oracle written from the published LPIPS v0.1 algorithm
(Zhang et al., "The Unreasonable Effectiveness of Deep Features...", CVPR
2018) and the lpips-package semantics:

    scaling layer: (x - shift) / scale  on [-1, 1] NCHW inputs
    AlexNet features at relu1..relu5 (torchvision layer indices 1,4,7,9,11)
    channel-unit-normalize (eps added to the norm), squared difference
    1x1 linear heads (Dropout + Conv2d bias=False), spatial mean, sum

State-dict names intentionally match torchvision's ``alexnet().features``
and lpips's ``lin{k}.model.1.weight`` so that

  - ``tools/convert_weights.convert_lpips(sd, sd)`` maps an oracle
    state_dict straight onto the JAX pytree (the oracle IS a drop-in for
    the real artifact pair), and
  - the real ``alex.pth`` + ``lpips_weights_v0.1/alex.pth`` load into the
    oracle unchanged once the artifacts are available.

Used by tests/test_lpips_oracle.py (numeric pinning of the JAX port) and
tests/test_reference_parity.py (as the ``lpips`` module stub, so the
reference Trainer runs with the perceptual loss ON).
"""

from __future__ import annotations

import os

import torch
import torch.nn as nn


class _NetLin(nn.Module):
    """lpips.NetLinLayer: Dropout + 1x1 conv, no bias."""

    def __init__(self, chn_in: int):
        super().__init__()
        self.model = nn.Sequential(nn.Dropout(),
                                   nn.Conv2d(chn_in, 1, 1, bias=False))

    def forward(self, x):
        return self.model(x)


def _alexnet_features() -> nn.Sequential:
    """torchvision.models.alexnet().features, spelled out (torchvision is
    not installed; the layer indices are that module's public contract)."""
    return nn.Sequential(
        nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2),    # 0
        nn.ReLU(inplace=False),                                   # 1  relu1
        nn.MaxPool2d(kernel_size=3, stride=2),                    # 2
        nn.Conv2d(64, 192, kernel_size=5, padding=2),             # 3
        nn.ReLU(inplace=False),                                   # 4  relu2
        nn.MaxPool2d(kernel_size=3, stride=2),                    # 5
        nn.Conv2d(192, 384, kernel_size=3, padding=1),            # 6
        nn.ReLU(inplace=False),                                   # 7  relu3
        nn.Conv2d(384, 256, kernel_size=3, padding=1),            # 8
        nn.ReLU(inplace=False),                                   # 9  relu4
        nn.Conv2d(256, 256, kernel_size=3, padding=1),            # 10
        nn.ReLU(inplace=False),                                   # 11 relu5
    )


_RELU_IDX = (1, 4, 7, 9, 11)
_CHNS = (64, 192, 384, 256, 256)


class LPIPS(nn.Module):
    """Drop-in for ``lpips.LPIPS(net='alex', version='0.1',
    model_path=...)`` with the constructor signature the reference uses
    (training.py:76).  ``model_path`` (the lin-head weights) is loaded when
    it exists and silently skipped otherwise (test environments run with
    the seeded random initialization)."""

    def __init__(self, net: str = "alex", version: str = "0.1",
                 model_path: str | None = None, use_dropout: bool = True,
                 eval_mode: bool = True):
        super().__init__()
        assert net == "alex" and version == "0.1", (
            "oracle implements exactly the configuration the reference "
            "uses (training.py:76)")
        self.features = _alexnet_features()
        for k, c in enumerate(_CHNS):
            setattr(self, f"lin{k}", _NetLin(c))
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))
        if model_path and os.path.exists(model_path):
            sd = torch.load(model_path, map_location="cpu")
            self.load_state_dict(sd, strict=False)
        if eval_mode:
            self.eval()

    def _feats(self, x):
        outs = []
        h = x
        for i, layer in enumerate(self.features):
            h = layer(h)
            if i in _RELU_IDX:
                outs.append(h)
        return outs

    @staticmethod
    def _normalize(x, eps: float = 1e-10):
        norm = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (norm + eps)

    def forward(self, in0, in1, retPerLayer: bool = False):
        """in0, in1: [B, 3, H, W] in [-1, 1].  Returns [B, 1, 1, 1]."""
        f0 = self._feats((in0 - self.shift) / self.scale)
        f1 = self._feats((in1 - self.shift) / self.scale)
        res = []
        for k, (a, b) in enumerate(zip(f0, f1)):
            d = (self._normalize(a) - self._normalize(b)) ** 2
            res.append(getattr(self, f"lin{k}")(d).mean((2, 3), keepdim=True))
        val = sum(res)
        if retPerLayer:
            return val, res
        return val
