"""VGG-16 backbone parity vs a torch oracle with torchvision key layout."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from relaxtpu.models.vgg import VGG16, VGG_TAPS, port_torch_vgg16  # noqa: E402


class TorchVGG16(tnn.Module):
    def __init__(self):
        super().__init__()
        plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
        layers, cin = [], 3
        for p in plan:
            if p == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, p, 3, padding=1), tnn.ReLU(inplace=False)]
                cin = p
        self.features = tnn.Sequential(*layers)
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(),
            tnn.Linear(4096, 1000),
        )

    def forward(self, x):
        taps = {}
        for i, m in enumerate(self.features):
            if isinstance(m, tnn.Conv2d):
                x = m(x)
                taps[f"conv{i}"] = x
            else:
                x = m(x)
        x = torch.flatten(x, 1)
        x = self.classifier[0](x)
        x = self.classifier[1](x)
        x = self.classifier[3](x)
        taps["fc2"] = x
        return taps


@pytest.mark.slow
def test_vgg16_parity():
    gen = torch.Generator().manual_seed(0)
    oracle = TorchVGG16().eval()
    with torch.no_grad():
        # scale weights down so 13 stacked convs don't blow up activations
        for m in oracle.modules():
            if isinstance(m, (tnn.Conv2d, tnn.Linear)):
                m.weight.mul_(0.3)
        x = torch.randn(1, 3, 224, 224, generator=gen)
        want = {k: v.numpy() for k, v in oracle(x).items()}

    variables = port_torch_vgg16(oracle.state_dict())
    got = VGG16().apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), reduce=None)
    for name in VGG_TAPS:
        g = np.asarray(got[name]).transpose(0, 3, 1, 2)
        scale = max(1e-3, np.abs(want[name]).max())
        assert np.abs(g - want[name]).max() / scale < 1e-3, name
    scale = max(1e-3, np.abs(want["fc2"]).max())
    assert np.abs(np.asarray(got["fc2"]) - want["fc2"]).max() / scale < 1e-3
