"""Weight-transfer parity against the actual PyTorch reference model.

Imports the reference's BiDateNet read-only from /root/reference (no code is
copied — the torch module is loaded and executed as a black-box oracle),
transfers its randomly-initialized weights into our Flax BiDateNet, and
asserts the two produce the same logits on the same input.  This validates
every architectural choice at once: conv padding, BN eval semantics,
align-corners bilinear upsampling, pad-to-skip split, concat order, fusion,
and weight layout — the whole "F1 within 1%" parity chain at the model
level (BASELINE.md).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")),
    reason="reference repo not mounted")


def _load_reference_model():
    sys.path.insert(0, REFERENCE)
    try:
        from models.bidate_model import BiDateNet as TorchBiDateNet
    finally:
        sys.path.pop(0)
    torch.manual_seed(0)
    model = TorchBiDateNet(13, 2)
    model.eval()
    return model


def _t2j(t):
    # np.array(copy=True): jnp.asarray on CPU can zero-copy a contiguous
    # numpy view of a torch buffer, silently aliasing tensors that torch
    # later mutates in place (opt.step, BN running-stat updates) — which
    # would corrupt "pre-step" snapshots in the train-parity test.
    return jnp.asarray(np.array(t.detach().numpy(), copy=True))


def _conv(w, b):
    return {"kernel": _t2j(w.permute(2, 3, 1, 0)), "bias": _t2j(b)}


def _bn_params(bn):
    return ({"scale": _t2j(bn.weight), "bias": _t2j(bn.bias)},
            {"mean": _t2j(bn.running_mean), "var": _t2j(bn.running_var)})


def _double_conv(seq):
    """torch double_conv Sequential[Conv,BN,ReLU,Conv,BN,ReLU] -> flax
    DoubleConv {conv1,bn1,conv2,bn2} (params, batch_stats)."""
    p, s = {}, {}
    p["conv1"] = _conv(seq[0].weight, seq[0].bias)
    p["bn1"], s["bn1"] = _bn_params(seq[1])
    p["conv2"] = _conv(seq[3].weight, seq[3].bias)
    p["bn2"], s["bn2"] = _bn_params(seq[4])
    return p, s


def _transfer(tm):
    """torch BiDateNet -> flax {params, batch_stats} trees."""
    params, stats = {}, {}
    params["inc"], stats["inc"] = _double_conv(tm.inc.conv.conv)
    for name in ("down1", "down2", "down3", "down4"):
        dc = getattr(tm, name).mpconv[1].conv
        p, s = _double_conv(dc)
        params[name], stats[name] = {"conv": p}, {"conv": s}
    for name in ("up1", "up2", "up3", "up4"):
        dc = getattr(tm, name).conv.conv
        p, s = _double_conv(dc)
        params[name], stats[name] = {"conv": p}, {"conv": s}
    params["outc"] = {"conv": _conv(tm.outc.conv.weight, tm.outc.conv.bias)}
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("hw", [(32, 32), (90, 90)])
def test_logits_match_reference_with_transferred_weights(hw):
    from fabric_tpu.models import BiDateNet
    tm = _load_reference_model()
    variables = _transfer(tm)

    rng = np.random.RandomState(0)
    h, w = hw
    a = rng.randn(2, h, w, 13).astype(np.float32)
    b = rng.randn(2, h, w, 13).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                 torch.from_numpy(b.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    model = BiDateNet(dtype=jnp.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(a), jnp.asarray(b),
                                  train=False))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)
    # argmax change maps must agree essentially everywhere
    agree = np.mean(np.argmax(ours, -1) == np.argmax(ref, -1))
    assert agree > 0.999


def test_transferred_param_count_matches():
    from fabric_tpu.models import BiDateNet
    tm = _load_reference_model()
    torch_count = sum(p.numel() for p in tm.parameters() if p.requires_grad)
    variables = _transfer(tm)
    ours = sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(variables["params"]))
    assert ours == torch_count == 13_401_154
