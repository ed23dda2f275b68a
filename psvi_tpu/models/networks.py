"""Network factories for the variational model zoo.

TPU-native re-designs of the reference factories in
``psvi/models/neural_net.py``:

- ``make_fcnet``        (ref :267-297)  — mean-field MLP ("fn" architecture)
- ``make_regressor_net``(ref :300-331)  — regression MLP
- ``make_fc2net``       (ref :494-524)  — full-covariance MLP ("fn2")
- ``make_lenet``        (ref :334-359)  — LeNet-5 Bayesian CNN
- ``make_alexnet``      (ref :362-397)  — AlexNet-style Bayesian CNN
- ``make_resnet``       (ref :527-659)  — ResNet-18/34/50/101/152 (32×32)
- ``make_logreg``       (ref ``psvi_classes.py:694-699``) — single VILinear
- ``set_up_model``      (ref ``psvi_classes.py:689-758``) — architecture dispatch
"""

from __future__ import annotations

from typing import Optional

from psvi_tpu.models.layers import (
    AvgPool2d,
    BatchNorm2d,
    Flatten,
    MaxPool2d,
    LocalResponseNorm,
    ReLU,
    Residual,
    Sequential,
    VIConv2d,
    VILinear,
    VILinearFullCov,
)


def make_logreg(d: int, nc: int, init_sd: float = 1e-3, prior_sd: float = 1.0):
    """Bayesian multinomial logistic regression: one variational dense layer."""
    return Sequential((VILinear(d, nc, init_sd=init_sd, prior_sd=prior_sd),))


def make_logreg_fullcov(
    d: int, nc: int, init_sd: float = 1e-3, prior_sd: float = 1.0
):
    return Sequential((VILinearFullCov(d, nc, init_sd=init_sd, prior_sd=prior_sd),))


def make_fcnet(
    in_dim: int,
    h_dim: int,
    out_dim: int,
    n_layers: int = 2,
    init_sd: float = 0.01,
    prior_sd: float = 1.0,
):
    layers = []
    for i in range(n_layers):
        layers.append(
            VILinear(in_dim if i == 0 else h_dim, h_dim, init_sd=init_sd, prior_sd=prior_sd)
        )
        layers.append(ReLU())
    layers.append(VILinear(h_dim, out_dim, init_sd=init_sd, prior_sd=prior_sd))
    return Sequential(tuple(layers))


def make_regressor_net(
    in_dim: int,
    h_dim: int,
    out_dim: int = 1,
    n_layers: int = 2,
    init_sd: float = 0.01,
    prior_sd: float = 1.0,
):
    # Same topology as make_fcnet; kept separate for parity with the reference.
    return make_fcnet(in_dim, h_dim, out_dim, n_layers, init_sd, prior_sd)


def make_fc2net(
    in_dim: int,
    h_dim: int,
    out_dim: int,
    n_layers: int = 2,
    init_sd: float = 0.01,
    prior_sd: float = 1.0,
):
    """Full-covariance MLP ("fn2"): every dense layer is a VILinearFullCov."""
    layers = []
    for i in range(n_layers):
        layers.append(
            VILinearFullCov(
                in_dim if i == 0 else h_dim, h_dim, init_sd=init_sd, prior_sd=prior_sd
            )
        )
        layers.append(ReLU())
    layers.append(VILinearFullCov(h_dim, out_dim, init_sd=init_sd, prior_sd=prior_sd))
    return Sequential(tuple(layers))


def make_lenet(init_sd: float = 0.01, prior_sd: float = 1.0, in_channels: int = 1):
    """LeNet-5: conv 1→6→16 (5×5), pools, fc 400→120→84→10
    (ref ``psvi/models/neural_net.py:334-359``)."""
    kw = dict(init_sd=init_sd, prior_sd=prior_sd)
    return Sequential(
        (
            # Pool BEFORE ReLU: bitwise-equal forward to the reference's
            # relu→pool (max and relu commute) but 4x smaller ReLU-mask /
            # activation residuals in the bilevel unroll (~20% faster
            # nested step on v5e). Gradient routing on ReLU-induced ties
            # also matches torch's single-argmax maxpool more closely.
            VIConv2d(in_channels, 6, 5, padding=2, **kw),
            MaxPool2d(2, 2),
            ReLU(),
            VIConv2d(6, 16, 5, padding=0, **kw),
            MaxPool2d(2, 2),
            ReLU(),
            Flatten(),
            VILinear(400, 120, **kw),
            ReLU(),
            VILinear(120, 84, **kw),
            ReLU(),
            # Final classifier uses default init_sd (ref: `linear_class(84, 10)`
            # without **kwargs at neural_net.py:358).
            VILinear(84, 10, prior_sd=prior_sd),
        )
    )


def make_alexnet(init_sd: float = 0.01, prior_sd: float = 1.0, in_channels: int = 3):
    """AlexNet-style CNN for 32×32×3 inputs (ref neural_net.py:362-397)."""
    kw = dict(init_sd=init_sd, prior_sd=prior_sd)
    return Sequential(
        (
            VIConv2d(in_channels, 64, 5, stride=1, padding=2),
            # pool↔relu swap: bitwise-equal forward, smaller residuals
            # (every pool window contains ≥4 real elements, so the −inf
            # padding never survives the max)
            MaxPool2d(3, 2, padding=1),
            ReLU(),
            LocalResponseNorm(4, alpha=0.001 / 9.0, beta=0.75, k=1.0),
            VIConv2d(64, 64, 5, padding=2, stride=1),
            ReLU(),
            LocalResponseNorm(4, alpha=0.001 / 9.0, beta=0.75, k=1.0),
            MaxPool2d(3, 2, padding=1),
            Flatten(),
            VILinear(4096, 384, **kw),
            ReLU(),
            VILinear(384, 192, **kw),
            ReLU(),
            VILinear(192, 10, prior_sd=prior_sd),
        )
    )


def _conv3x3(cin, cout, stride=1, init_sd=0.1, prior_sd=1.0):
    return VIConv2d(
        cin, cout, 3, stride=stride, padding=1, use_bias=False,
        init_sd=init_sd, prior_sd=prior_sd,
    )


def _basic_block(in_planes, planes, stride=1, init_sd=0.1, prior_sd=1.0):
    """ResNet BasicBlock (ref neural_net.py:532-555)."""
    expansion = 1
    body = Sequential(
        (
            _conv3x3(in_planes, planes, stride, init_sd, prior_sd),
            BatchNorm2d(planes),
            ReLU(),
            _conv3x3(planes, planes, 1, init_sd, prior_sd),
            BatchNorm2d(planes),
        )
    )
    if stride != 1 or in_planes != expansion * planes:
        shortcut = Sequential(
            (
                VIConv2d(
                    in_planes, expansion * planes, 1, stride=stride,
                    use_bias=False, init_sd=init_sd, prior_sd=prior_sd,
                ),
                BatchNorm2d(expansion * planes),
            )
        )
    else:
        shortcut = Sequential(())
    return Residual(body, shortcut), expansion * planes


def _bottleneck_block(in_planes, planes, stride=1, init_sd=0.1, prior_sd=1.0):
    """ResNet Bottleneck (ref neural_net.py:558-584)."""
    expansion = 4
    body = Sequential(
        (
            VIConv2d(in_planes, planes, 1, use_bias=False, init_sd=init_sd, prior_sd=prior_sd),
            BatchNorm2d(planes),
            ReLU(),
            VIConv2d(planes, planes, 3, stride=stride, padding=1, use_bias=False,
                     init_sd=init_sd, prior_sd=prior_sd),
            BatchNorm2d(planes),
            ReLU(),
            VIConv2d(planes, expansion * planes, 1, use_bias=False,
                     init_sd=init_sd, prior_sd=prior_sd),
            BatchNorm2d(expansion * planes),
        )
    )
    if stride != 1 or in_planes != expansion * planes:
        shortcut = Sequential(
            (
                VIConv2d(in_planes, expansion * planes, 1, stride=stride,
                         use_bias=False, init_sd=init_sd, prior_sd=prior_sd),
                BatchNorm2d(expansion * planes),
            )
        )
    else:
        shortcut = Sequential(())
    return Residual(body, shortcut), expansion * planes


_RESNET_ARCHS = {
    "resnet18": ("basic", [2, 2, 2, 2]),
    "resnet34": ("basic", [3, 4, 6, 3]),
    "resnet50": ("bottleneck", [3, 4, 6, 3]),
    "resnet101": ("bottleneck", [3, 4, 23, 3]),
    "resnet152": ("bottleneck", [3, 8, 36, 3]),
}


def make_resnet(
    arch: str = "resnet18",
    channel: int = 3,
    num_classes: int = 10,
    init_sd: float = 0.1,
    prior_sd: float = 1.0,
):
    """All-variational ResNet for 32×32 inputs (ref neural_net.py:587-659)."""
    kind, num_blocks = _RESNET_ARCHS[arch.lower()]
    block_fn = _basic_block if kind == "basic" else _bottleneck_block
    expansion = 1 if kind == "basic" else 4

    layers = [
        _conv3x3(channel, 64, 1, init_sd, prior_sd),
        BatchNorm2d(64),
        ReLU(),
    ]
    in_planes = 64
    for planes, nb, stride0 in zip(
        [64, 128, 256, 512], num_blocks, [1, 2, 2, 2]
    ):
        strides = [stride0] + [1] * (nb - 1)
        for s in strides:
            blk, in_planes = block_fn(in_planes, planes, s, init_sd, prior_sd)
            layers.append(blk)
    layers += [
        AvgPool2d(4),
        Flatten(),
        VILinear(512 * expansion, num_classes, init_sd=init_sd, prior_sd=prior_sd),
    ]
    return Sequential(tuple(layers))


def set_up_model(
    architecture: str,
    D: int,
    n_hidden: Optional[int],
    nc: int,
    init_sd: float,
    n_layers: int = 1,
    n_channels: int = 1,
    prior_sd: float = 1.0,
):
    """Architecture dispatch (ref ``psvi_classes.py:689-758``,
    ``experiments_utils.py:346-413``)."""
    if architecture == "logistic_regression":
        return make_logreg(D, nc, init_sd=init_sd, prior_sd=prior_sd)
    if architecture == "logistic_regression_fullcov":
        return make_logreg_fullcov(D, nc, init_sd=init_sd, prior_sd=prior_sd)
    if architecture in {"fn", "residual_fn"}:
        return make_fcnet(
            D, n_hidden, nc, n_layers=n_layers, init_sd=init_sd, prior_sd=prior_sd
        )
    if architecture == "fn2":
        return make_fc2net(
            D, n_hidden, nc, n_layers=n_layers, init_sd=init_sd, prior_sd=prior_sd
        )
    if architecture == "lenet":
        return make_lenet(init_sd=init_sd, prior_sd=prior_sd, in_channels=n_channels)
    if architecture == "alexnet":
        return make_alexnet(init_sd=init_sd, prior_sd=prior_sd, in_channels=n_channels)
    if architecture == "regressor_net":
        return make_regressor_net(
            D, n_hidden, nc, n_layers=n_layers, init_sd=init_sd, prior_sd=prior_sd
        )
    if architecture == "resnet":
        return make_resnet(
            "resnet18", channel=n_channels if n_channels else 3,
            num_classes=nc, init_sd=init_sd, prior_sd=prior_sd,
        )
    raise ValueError(f"unknown architecture: {architecture!r}")
