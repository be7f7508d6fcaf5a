"""Golden-numerics tests against real torch modules (torch CPU is installed).

The reference model is torch (tree_learn/model/blocks.py, tree_learn.py); where
a layer has a runnable torch equivalent in this env we use it as the oracle:

* apply_bn        vs torch.nn.BatchNorm1d(eps=1e-4, momentum=0.1)
                  (reference tree_learn.py:34) — train, eval, frozen modes
* apply_mlp       vs the reference MLP stack Linear-BN-ReLU-Linear
                  (reference blocks.py:8-18)
* subm_conv       vs torch.nn.functional.conv3d on a fully-active dense box
                  (submanifold == dense conv when every site is active),
                  importing a 5-D spconv-layout weight through the .pth
                  converter — validates both the layout transpose and the
                  kernel-offset enumeration order
* import_torch_state_dict on a state_dict produced by REAL torch modules
  (not hand-built arrays)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from treelearn_tpu.model.blocks import apply_bn, apply_mlp, init_mlp
from treelearn_tpu.model.checkpoint import (
    _convert_conv_weight,
    import_torch_state_dict,
)
from treelearn_tpu.ops.sparse import build_subm_rulebook, grid_from_coords, subm_conv

BN_KW = dict(eps=1e-4, momentum=0.1)


def _bn_params_state(bn: "torch.nn.BatchNorm1d"):
    params = {"weight": bn.weight.detach().numpy().copy(),
              "bias": bn.bias.detach().numpy().copy()}
    state = {"running_mean": bn.running_mean.numpy().copy(),
             "running_var": bn.running_var.numpy().copy()}
    return params, state


def test_bn_train_mode_matches_torch():
    torch.manual_seed(0)
    c, n = 24, 400
    bn = torch.nn.BatchNorm1d(c, **BN_KW)
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-0.3, 0.3)
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
    params, state = _bn_params_state(bn)

    x = torch.randn(n, c)
    bn.train()
    want = bn(x).detach().numpy()

    got, new_state = apply_bn(params, state, jnp.asarray(x.numpy()),
                              jnp.ones((n,), bool), training=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    # running stats updated with the unbiased variance estimate
    np.testing.assert_allclose(np.asarray(new_state["running_mean"]),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["running_var"]),
                               bn.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_bn_eval_and_frozen_match_torch_eval():
    torch.manual_seed(1)
    c, n = 16, 300
    bn = torch.nn.BatchNorm1d(c, **BN_KW)
    with torch.no_grad():
        bn.running_mean.normal_(0, 1.0)
        bn.running_var.uniform_(0.2, 3.0)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.normal_(0, 0.1)
    params, state = _bn_params_state(bn)

    x = torch.randn(n, c)
    bn.eval()
    want = bn(x).detach().numpy()

    got_eval, se = apply_bn(params, state, jnp.asarray(x.numpy()),
                            jnp.ones((n,), bool), training=False)
    np.testing.assert_allclose(np.asarray(got_eval), want, rtol=1e-4, atol=1e-5)
    assert se is state  # eval does not touch running stats

    # frozen (fixed_modules parity, reference tree_learn.py:66-72): eval-mode
    # statistics even under training=True
    got_frozen, sf = apply_bn(params, state, jnp.asarray(x.numpy()),
                              jnp.ones((n,), bool), training=True, frozen=True)
    np.testing.assert_allclose(np.asarray(got_frozen), want, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sf["running_var"]),
                               state["running_var"])


class _RefMLP(torch.nn.Sequential):
    """The reference MLP (blocks.py:8-18): Linear-BN-ReLU-Linear."""

    def __init__(self, c_in, c_out):
        super().__init__(
            torch.nn.Linear(c_in, c_in),
            torch.nn.BatchNorm1d(c_in, **BN_KW),
            torch.nn.ReLU(),
            torch.nn.Linear(c_in, c_out),
        )


def _import_mlp(tmod: "_RefMLP", c_in, c_out):
    """Round a torch MLP's state_dict through the .pth importer."""
    params, state = init_mlp(np.random.SeedSequence(0), c_in, c_out)
    sd = {k: v.numpy() for k, v in tmod.state_dict().items()}
    p, s, skipped = import_torch_state_dict(sd, params, state, strict=True)
    assert not skipped
    return p, s


@pytest.mark.parametrize("training", [False, True])
def test_mlp_matches_torch(training):
    torch.manual_seed(2)
    c_in, c_out, n = 32, 3, 257
    tmod = _RefMLP(c_in, c_out)
    with torch.no_grad():
        tmod[1].running_mean.normal_(0, 0.3)
        tmod[1].running_var.uniform_(0.5, 1.5)
    params, state = _import_mlp(tmod, c_in, c_out)

    x = torch.randn(n, c_in)
    tmod.train(training)
    want = tmod(x).detach().numpy()

    got, new_state = apply_mlp(params, state, jnp.asarray(x.numpy()),
                               jnp.ones((n,), bool), training=training)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
    if training:
        np.testing.assert_allclose(np.asarray(new_state["1"]["running_mean"]),
                                   tmod[1].running_mean.numpy(),
                                   rtol=1e-4, atol=1e-6)


def test_subm_conv_matches_torch_dense_conv3d():
    """On a fully-active box, submanifold conv == dense conv3d (zero padding
    == inactive-outside).  The weight travels through the spconv-layout
    converter, so this pins the (out, kx, ky, kz, in) transpose AND the
    lexicographic offset order of ops/sparse.py:kernel_offsets against
    torch's cross-correlation convention."""
    torch.manual_seed(3)
    cin, cout = 4, 5
    X = Y = Z = 6
    coords = np.array([(0, x, y, z) for x in range(X) for y in range(Y)
                       for z in range(Z)], np.int32)
    n = len(coords)
    cap = 256
    grid, _ = grid_from_coords(jnp.asarray(coords), (X, Y, Z), capacity=cap)
    rule = build_subm_rulebook(grid, 3)

    # the spconv2 checkpoint tensor: (c_out, kx, ky, kz, c_in)
    w_spconv = torch.randn(cout, 3, 3, 3, cin)
    feats_rows = torch.randn(n, cin)

    # torch oracle: conv3d weight is (out, in, kx, ky, kz)
    dense_in = torch.zeros(1, cin, X, Y, Z)
    gc = np.asarray(grid.coords)[:n]  # row i of the grid -> its (b, x, y, z)
    for i in range(n):
        _, x, y, z = gc[i]
        dense_in[0, :, x, y, z] = feats_rows[i]
    want_dense = torch.nn.functional.conv3d(
        dense_in, w_spconv.permute(0, 4, 1, 2, 3), padding=1)

    w_ours = _convert_conv_weight(w_spconv.numpy(), 3)
    feats = jnp.zeros((cap, cin)).at[:n].set(jnp.asarray(feats_rows.numpy()))
    got = np.asarray(subm_conv(feats, jnp.asarray(w_ours), rule,
                               grid.live_mask))
    want = np.stack([want_dense[0, :, x, y, z].numpy()
                     for _, x, y, z in gc])
    np.testing.assert_allclose(got[:n], want, rtol=1e-3, atol=1e-4)


def test_pth_import_from_real_torch_modules():
    """state_dict produced by real torch modules (BN + Linear + a 5-D
    spconv-layout conv parameter) imports into the (params, state) trees with
    running statistics landing in state, conv weights relaid out, and
    size-mismatched keys skipped non-strictly (transfer-learning parity,
    reference util/train.py:77-84)."""

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.semantic_linear = _RefMLP(8, 2)
            self.input_conv = torch.nn.ModuleDict()
            # a stand-in for spconv SubMConv3d: only its parameter shape matters
            conv = torch.nn.Module()
            conv.weight = torch.nn.Parameter(torch.randn(8, 3, 3, 3, 4))
            self.input_conv["0"] = conv

    torch.manual_seed(4)
    net = Net()
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    from treelearn_tpu.model.blocks import init_subm_conv

    params = {
        "semantic_linear": init_mlp(np.random.SeedSequence(1), 8, 2)[0],
        "input_conv": {"0": init_subm_conv(np.random.SeedSequence(2), 3, 4, 8)},
    }
    state = {"semantic_linear": init_mlp(np.random.SeedSequence(1), 8, 2)[1]}

    p, s, skipped = import_torch_state_dict(sd, params, state, strict=True)
    assert not skipped
    got = p["input_conv"]["0"]["weight"]
    assert got.shape == (27, 4, 8)
    # spot-check one element of the layout transpose
    w = net.input_conv["0"].weight.detach().numpy()
    np.testing.assert_allclose(got[(1 * 3 + 2) * 3 + 0, 3, 5],
                               w[5, 1, 2, 0, 3], rtol=1e-6)
    np.testing.assert_allclose(s["semantic_linear"]["1"]["running_mean"],
                               net.semantic_linear[1].running_mean.numpy())

    # non-strict import skips a size-mismatched head (transfer learning)
    sd_bad = dict(sd)
    sd_bad["semantic_linear.3.weight"] = np.zeros((7, 8), np.float32)
    p2, _, skipped2 = import_torch_state_dict(sd_bad, params, state,
                                              strict=False)
    assert "semantic_linear.3.weight" in skipped2
    np.testing.assert_allclose(p2["semantic_linear"]["3"]["weight"],
                               params["semantic_linear"]["3"]["weight"])
