"""ResNet backbone tests (≙ reference tests/test_models/test_backbones)."""
import jax
import numpy as np
import pytest

from stc_unet_tpu.models import build_backbone


def _forward(cfg, shape=(1, 32, 32, 3)):
    model = build_backbone(cfg)
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    return outs


def test_resnet50_shapes():
    outs = _forward(dict(type='ResNet', depth=50, out_indices=(0, 1, 2, 3)))
    assert len(outs) == 4
    # strides 4, 8, 16, 32; channels 256..2048
    assert outs[0].shape == (1, 8, 8, 256)
    assert outs[1].shape == (1, 4, 4, 512)
    assert outs[2].shape == (1, 2, 2, 1024)
    assert outs[3].shape == (1, 1, 1, 2048)


def test_resnet18_basicblock():
    outs = _forward(dict(type='ResNet', depth=18, out_indices=(0, 3)))
    assert len(outs) == 2
    assert outs[0].shape == (1, 8, 8, 64)
    assert outs[1].shape == (1, 1, 1, 512)


def test_resnet_dilated_os8():
    """The author's PSPNet/DeepLab setting: strides (1,2,1,1) +
    dilations (1,1,2,4) keep output stride 8."""
    outs = _forward(dict(type='ResNet', depth=50, strides=(1, 2, 1, 1),
                         dilations=(1, 1, 2, 4), contract_dilation=True),
                    shape=(1, 64, 64, 3))
    assert outs[1].shape[1:3] == (8, 8)
    assert outs[2].shape[1:3] == (8, 8)
    assert outs[3].shape[1:3] == (8, 8)


def test_resnet_v1c_v1d():
    outs_c = _forward(dict(type='ResNetV1c', depth=50, out_indices=(3,)))
    outs_d = _forward(dict(type='ResNetV1d', depth=50, out_indices=(3,)))
    assert outs_c[0].shape == (1, 1, 1, 2048)
    assert outs_d[0].shape == (1, 1, 1, 2048)


def test_bottleneck_torch_parity():
    """One bottleneck with downsample vs torch (weights copied by hand)."""
    import torch
    import torch.nn as tnn

    from stc_unet_tpu.models.backbones.resnet import Bottleneck

    class TorchBottleneck(tnn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

        def forward(self, x):
            idt = self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + idt)

    torch.manual_seed(0)
    tm = TorchBottleneck(8, 4, 2).eval()
    x = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        expected = tm(x).numpy()

    block = Bottleneck(planes=4, stride=2, downsample=True)
    xj = x.numpy().transpose(0, 2, 3, 1)
    variables = block.init(jax.random.PRNGKey(0), xj, train=False)

    def conv_w(t):
        return np.transpose(t.detach().numpy(), (2, 3, 1, 0))

    params = {
        'conv1': {'conv': {'kernel': conv_w(tm.conv1.weight)}},
        'conv2': {'conv': {'kernel': conv_w(tm.conv2.weight)}},
        'conv3': {'conv': {'kernel': conv_w(tm.conv3.weight)}},
        'bn1': {'scale': tm.bn1.weight.detach().numpy(),
                'bias': tm.bn1.bias.detach().numpy()},
        'bn2': {'scale': tm.bn2.weight.detach().numpy(),
                'bias': tm.bn2.bias.detach().numpy()},
        'bn3': {'scale': tm.bn3.weight.detach().numpy(),
                'bias': tm.bn3.bias.detach().numpy()},
        'downsample': {
            '0': {'conv': {'kernel': conv_w(tm.downsample[0].weight)}},
            '1': {'scale': tm.downsample[1].weight.detach().numpy(),
                  'bias': tm.downsample[1].bias.detach().numpy()}},
    }
    stats = {
        'bn1': {'mean': np.zeros(4, np.float32),
                'var': np.ones(4, np.float32)},
        'bn2': {'mean': np.zeros(4, np.float32),
                'var': np.ones(4, np.float32)},
        'bn3': {'mean': np.zeros(16, np.float32),
                'var': np.ones(16, np.float32)},
        'downsample': {'1': {'mean': np.zeros(16, np.float32),
                             'var': np.ones(16, np.float32)}},
    }
    got = block.apply({'params': params, 'batch_stats': stats}, xj,
                      train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               expected, rtol=1e-4, atol=1e-5)
