"""Model parity: converted torch checkpoints must reproduce logits.

Uses the actual reference package (read-only, imported from
/root/reference) as the torch-side oracle, and the shipped
``policy_17.pt`` weights.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
WEIGHTS = f"{REF}/data/weights/policy_17.pt"


def _torch_policy():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from bokego.nnet import PolicyNet as TorchPolicy  # reference oracle

    net = TorchPolicy()
    ckpt = torch.load(WEIGHTS, map_location="cpu", weights_only=False)
    net.load_state_dict(ckpt["model_state_dict"])
    net.eval()
    return net


def _random_features(rng, batch):
    """Realistic feature tensors from random games."""
    from bokego_tpu.env import rules, state as st
    from bokego_tpu.coords import NN, PASS_ACTION
    from bokego_tpu.features import features_batch

    s = st.new_game_batch(batch)
    step = jax.jit(rules.step_batch)
    legal = jax.jit(rules.legal_mask_batch)
    for _ in range(rng.integers(5, 40)):
        lm = np.asarray(legal(s))
        acts = []
        for b in range(batch):
            ch = np.flatnonzero(lm[b, :NN])
            acts.append(int(rng.choice(ch)) if len(ch) else PASS_ACTION)
        s = step(s, jnp.asarray(acts, dtype=jnp.int32))
    return np.asarray(features_batch(s))


def test_policy_conversion_logits_parity():
    torch = pytest.importorskip("torch")
    from bokego_tpu.models import convert, inference

    net = _torch_policy()
    variables = convert.load_policy(WEIGHTS)

    rng = np.random.default_rng(0)
    fts = _random_features(rng, batch=8)  # (8, 9, 9, 27) NHWC

    with torch.no_grad():
        torch_out = net(torch.from_numpy(fts.transpose(0, 3, 1, 2)).float()).numpy()
    jax_out = np.asarray(inference.policy_logits(variables, jnp.asarray(fts)))

    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-4)


def test_flax_to_torch_roundtrip_and_reference_load():
    """Bidirectional conversion: policy_17 -> flax -> torch reproduces the
    original state dict bitwise, and a flax-trained ValueNet exported with
    value_to_torch loads into the reference ValueNet (strict) and
    reproduces our value_fn outputs."""
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from bokego.nnet import ValueNet as TorchValue  # reference oracle

    from bokego_tpu.models import convert, init_value
    from bokego_tpu.models.inference import value_fn

    # policy round trip: torch -> flax -> torch, bitwise
    orig = convert.load_torch_checkpoint(WEIGHTS)
    back = convert.policy_to_torch(convert.policy_from_torch(orig))
    for k, v in orig.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            back[k].numpy(), v.detach().numpy(), err_msg=k
        )

    # value export: flax-native weights run in the reference net
    variables = init_value(jax.random.PRNGKey(3))
    sd = convert.value_to_torch(variables)
    net = TorchValue()
    net.load_state_dict(sd)  # strict: every key must match
    net.eval()
    fts = _random_features(np.random.default_rng(0), 4)
    with torch.no_grad():
        torch_out = net(torch.from_numpy(fts.transpose(0, 3, 1, 2)).float())
    jax_out = np.asarray(value_fn(variables, jnp.asarray(fts)))
    np.testing.assert_allclose(
        jax_out.reshape(-1), torch_out.numpy().reshape(-1), rtol=1e-4, atol=1e-4
    )


def test_value_net_shapes_and_range():
    from bokego_tpu.models import init_value
    from bokego_tpu.models.inference import value_fn

    variables = init_value(jax.random.PRNGKey(0))
    fts = jnp.zeros((4, 9, 9, 27), jnp.float32)
    v = value_fn(variables, fts)
    assert v.shape == (4,)
    assert np.all(np.abs(np.asarray(v)) <= 1.0)


def test_value_from_policy_transfer():
    from bokego_tpu.models import init_policy, init_value, value_from_policy

    pv = init_policy(jax.random.PRNGKey(1))
    vv = init_value(jax.random.PRNGKey(2))
    vv2 = value_from_policy(vv, pv)
    a = jax.tree.leaves(vv2["params"]["trunk"])
    b = jax.tree.leaves(pv["params"]["trunk"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # head params untouched
    assert "lin1" in vv2["params"]


def test_policy_v2_shape():
    from bokego_tpu.models.nets import PolicyNetV2

    net = PolicyNetV2()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 9, 27)))
    out = net.apply(variables, jnp.zeros((2, 9, 9, 27)))
    assert out.shape == (2, 81)


def test_sample_moves_legal_only():
    from bokego_tpu.models.inference import sample_moves

    rng = jax.random.PRNGKey(0)
    probs = jnp.full((4, 81), 1 / 81.0)
    mask = jnp.zeros((4, 82), bool).at[:, 3].set(True).at[:, 81].set(True)
    mv = sample_moves(rng, probs, mask)
    assert np.all(np.asarray(mv) == 3)
    # all illegal -> PASS
    mask0 = jnp.zeros((4, 82), bool).at[:, 81].set(True)
    mv0 = sample_moves(rng, probs, mask0[:, :82])
    assert np.all(np.asarray(mv0) == 81)
