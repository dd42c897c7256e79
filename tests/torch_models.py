"""Torch stand-in models for converter and logits-parity testing.

These reproduce the reference architectures *and their state-dict key
layout* (reference: src/model.py:43-316) so that
`torch_state_dict_to_variables` is exercised against the exact .pt schema a
real reference checkpoint would carry. They exist only in the test tree;
the framework itself never imports torch models.
"""

import torch
import torch.nn as nn


class _ConvBlock(nn.Module):
    # keys: <prefix>.conv.*, <prefix>.bn.*
    def __init__(self, i, o):
        super().__init__()
        self.conv = nn.Conv2d(i, o, 3, 1, 1)
        self.bn = nn.BatchNorm2d(o)
        self.pool = nn.MaxPool2d(2)
        self.dropout = nn.Dropout2d(0.1)

    def forward(self, x):
        return self.dropout(self.pool(torch.relu(self.bn(self.conv(x)))))


class TorchStandard(nn.Module):
    # keys: conv_layers.{0..3}.{conv,bn}.*, fc.{0,3}.*
    def __init__(self):
        super().__init__()
        chans = [1, 32, 64, 128, 256]
        self.conv_layers = nn.Sequential(
            *[_ConvBlock(chans[i], chans[i + 1]) for i in range(4)]
        )
        self.global_pool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Sequential(
            nn.Linear(256, 128), nn.ReLU(), nn.Dropout(0.5), nn.Linear(128, 2)
        )

    def forward(self, x):
        x = self.conv_layers(x)
        x = self.global_pool(x).flatten(1)
        return self.fc(x)


class TorchSmall(nn.Module):
    # keys: features.{0,1,4,5,6,9,10,11,14,15,16}.*, classifier.{1,4}.*
    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(1, 16, 3, padding=1),
            nn.BatchNorm2d(16),
            nn.ReLU(),
            nn.MaxPool2d(2),
            nn.Conv2d(16, 16, 3, padding=1, groups=16),
            nn.Conv2d(16, 32, 1),
            nn.BatchNorm2d(32),
            nn.ReLU(),
            nn.MaxPool2d(2),
            nn.Conv2d(32, 32, 3, padding=1, groups=32),
            nn.Conv2d(32, 64, 1),
            nn.BatchNorm2d(64),
            nn.ReLU(),
            nn.MaxPool2d(2),
            nn.Conv2d(64, 64, 3, padding=1, groups=64),
            nn.Conv2d(64, 128, 1),
            nn.BatchNorm2d(128),
            nn.ReLU(),
            nn.AdaptiveAvgPool2d((1, 1)),
        )
        self.classifier = nn.Sequential(
            nn.Flatten(),
            nn.Linear(128, 64),
            nn.ReLU(),
            nn.Dropout(0.3),
            nn.Linear(64, 2),
        )

    def forward(self, x):
        return self.classifier(self.features(x))


class _ResBlock(nn.Module):
    # keys: <prefix>.{conv1,bn1,conv2,bn2}.*, <prefix>.skip.{0,1}.*
    def __init__(self, i, o, stride=2):
        super().__init__()
        self.conv1 = nn.Conv2d(i, o, 3, stride=stride, padding=1)
        self.bn1 = nn.BatchNorm2d(o)
        self.conv2 = nn.Conv2d(o, o, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(o)
        self.skip = nn.Sequential(
            nn.Conv2d(i, o, 1, stride=stride), nn.BatchNorm2d(o)
        )

    def forward(self, x):
        identity = self.skip(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + identity)


class TorchResidual(nn.Module):
    # keys: conv1.{0,1}.*, res_blocks.{0,1}.*, fc.2.*
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(1, 32, 7, stride=2, padding=3),
            nn.BatchNorm2d(32),
            nn.ReLU(),
            nn.MaxPool2d(2),
        )
        self.res_blocks = nn.ModuleList([_ResBlock(32, 64), _ResBlock(64, 128)])
        self.global_pool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Sequential(nn.Flatten(), nn.Dropout(0.5), nn.Linear(128, 2))

    def forward(self, x):
        x = self.conv1(x)
        for b in self.res_blocks:
            x = b(x)
        return self.fc(self.global_pool(x))


TORCH_MODELS = {
    "standard": TorchStandard,
    "small": TorchSmall,
    "residual": TorchResidual,
}


def randomized(model_type: str, seed: int = 0) -> nn.Module:
    """An eval-mode model with fully randomized params *and* running stats,
    so BN eval semantics are genuinely exercised."""
    torch.manual_seed(seed)
    m = TORCH_MODELS[model_type]()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)
    m.eval()
    return m
