"""Shared torch STC-UNet fixture (module/attribute layout mirrors the
reference fork ``my_config/STC-UNet.py`` model classes) — the golden oracle
for converter/logit/Dice parity. Used by tests/test_utils/test_torch_convert
and tools/parity_eval.py."""
import torch
import torch.nn as nn
import torch.nn.functional as F

CH = [4, 8, 16, 32]        # tiny channel_list (doubling, like the real one)
DEC = [64, 32, 16, 8, 4]   # tiny decoder_channel


# -- torch fixture: attribute layout mirrors the reference fork -------------
def _dc(i, o):
    return nn.Sequential(nn.Conv2d(i, o, 3, padding=1), nn.BatchNorm2d(o),
                         nn.ReLU(), nn.Conv2d(o, o, 3, padding=1),
                         nn.BatchNorm2d(o), nn.ReLU())


class _DoubleConv(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv = _dc(i, o)

    def forward(self, x):
        return self.conv(x)


class _InConv(nn.Module):
    """Reference InConv wraps a DoubleConv (key path inc.conv.conv.N)."""

    def __init__(self, i, o):
        super().__init__()
        self.conv = _DoubleConv(i, o)

    def forward(self, x):
        return self.conv(x)


class _Down(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.down_conv = nn.Sequential(nn.MaxPool2d(2), _DoubleConv(i, o))

    def forward(self, x):
        return self.down_conv(x)


class _KSA(nn.Module):
    def __init__(self, c, kernels=(3, 5, 7), reduction=16, L=32):
        super().__init__()
        d = max(L, c // reduction)
        self.convs = nn.ModuleList([
            nn.Sequential(nn.Conv2d(c, c, k, padding=k // 2),
                          nn.BatchNorm2d(c), nn.ReLU()) for k in kernels])
        self.fc = nn.Linear(c, d)
        self.fcs = nn.ModuleList([nn.Linear(d, c) for _ in kernels])

    def forward(self, x):
        outs = [conv(x) for conv in self.convs]
        feats = torch.stack(outs, 0)
        s = sum(outs).mean(-1).mean(-1)
        z = self.fc(s)
        w = torch.stack([fc(z) for fc in self.fcs], 0)
        w = torch.softmax(w, 0)[:, :, :, None, None]
        return (w * feats).sum(0)


class _TrLayer(nn.Module):
    def __init__(self, c, heads):
        super().__init__()
        self.q = nn.Linear(c, c, bias=False)
        self.k = nn.Linear(c, c, bias=False)
        self.v = nn.Linear(c, c, bias=False)
        self.ma = nn.MultiheadAttention(c, heads)
        self.fc1 = nn.Linear(c, c, bias=False)
        self.fc2 = nn.Linear(c, c, bias=False)

    def forward(self, x):
        x = self.ma(self.q(x), self.k(x), self.v(x))[0] + x
        return self.fc2(self.fc1(x)) + x


class _TrBlock(nn.Module):
    def __init__(self, c, heads, layers):
        super().__init__()
        self.linear = nn.Linear(c, c)
        self.tr = nn.Sequential(*(_TrLayer(c, heads) for _ in range(layers)))
        self.c = c

    def forward(self, x):
        b, _, h, w = x.shape
        p = x.flatten(2).permute(2, 0, 1)  # (HW, B, C) seq-first
        out = self.tr(p + self.linear(p))
        return out.permute(1, 2, 0).reshape(b, self.c, h, w)


def _hswish(x):
    return x * F.relu6(x + 3) / 6


class _CoordAtt(nn.Module):
    def __init__(self, inp, oup, reduction=4):
        super().__init__()
        mip = max(8, inp // reduction)
        self.conv1 = nn.Conv2d(inp, mip, 1)
        self.bn1 = nn.BatchNorm2d(mip)
        self.conv_h = nn.Conv2d(mip, oup, 1)
        self.conv_w = nn.Conv2d(mip, oup, 1)

    def forward(self, x):
        n, c, h, w = x.shape
        x_h = x.mean(3, keepdim=True)
        x_w = x.mean(2, keepdim=True).permute(0, 1, 3, 2)
        y = _hswish(self.bn1(self.conv1(torch.cat([x_h, x_w], dim=2))))
        y_h, y_w = torch.split(y, [h, w], dim=2)
        y_w = y_w.permute(0, 1, 3, 2)
        return self.conv_w(y_w).sigmoid() * self.conv_h(y_h).sigmoid()


class _Up(nn.Module):
    def __init__(self, i, o, se=False):
        super().__init__()
        self.se = se
        if se:
            self.ca = _CoordAtt(i, i)
        self.conv = _DoubleConv(i, o)

    def forward(self, x1, x2):
        x1 = F.interpolate(x1, scale_factor=2, mode='bilinear',
                           align_corners=True)
        dy, dx = x2.shape[2] - x1.shape[2], x2.shape[3] - x1.shape[3]
        x1 = F.pad(x1, (dx // 2, dx - dx // 2, dy // 2, dy - dy // 2))
        x = torch.cat([x2, x1], dim=1)
        if self.se:
            x = self.ca(x) + x
        return self.conv(x)


class _TorchSTCUNet(nn.Module):
    """backbone+decode_head attribute names match the reference fork."""

    def __init__(self, stc=True, ch=None, dec=None):
        super().__init__()
        ch = CH if ch is None else ch
        dec = DEC if dec is None else dec
        self.stc = stc
        # backbone
        self.inc = _InConv(3, ch[0])
        self.down1 = _Down(ch[0], ch[1])
        self.down2 = _Down(ch[1], ch[2])
        self.down3 = _Down(ch[2], ch[3])
        self.down4 = _Down(ch[3], ch[3])
        if stc:
            self.context_layer1_1 = _KSA(ch[0])
            self.context_layer2_1 = _KSA(ch[1])
            self.context_layer3_1 = _KSA(ch[2])
            self.aspp4 = _TrBlock(ch[3], 2, 4)
            self.aspp5 = _TrBlock(ch[3], 2, 4)
        # head
        se = stc
        self.up1 = _Up(dec[0], dec[0] // 4, se=se)
        self.up2 = _Up(dec[1], dec[1] // 4, se=se)
        self.up3 = _Up(dec[2], dec[2] // 4, se=se)
        self.up4 = _Up(dec[3], dec[4], se=se)
        self.conv_seg = nn.Conv2d(dec[4], 2, 1)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        if self.stc:
            x1 = x1 + self.context_layer1_1(x1)
            x2 = x2 + self.context_layer2_1(x2)
            x3 = x3 + self.context_layer3_1(x3)
            x4 = self.aspp4(x4) + x4
            x5 = self.aspp5(x5) + x5
        out = self.up1(x5, x4)
        out = self.up2(out, x3)
        out = self.up3(out, x2)
        out = self.up4(out, x1)
        return self.conv_seg(out)


def prefixed_state_dict(tm):
    """Prefix backbone./decode_head. the way the fork's checkpoints do."""
    sd = {}
    head_names = ('up1', 'up2', 'up3', 'up4', 'conv_seg')
    for k, v in tm.state_dict().items():
        prefix = 'decode_head' if k.startswith(head_names) else 'backbone'
        sd[f'{prefix}.{k}'] = v
    return sd
