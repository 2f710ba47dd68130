"""torch->flax weight conversion: numerically-exact primitive mappings."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from onepose_st_tpu.utils import torch_convert as tc  # noqa: E402


def test_conv_semantics(rng):
    import flax.linen as nn
    import jax.numpy as jnp

    t_conv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=True)
    x = rng.uniform(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        y_t = t_conv(torch.from_numpy(x)).numpy()

    f_conv = nn.Conv(8, (3, 3), padding=1)
    params = {
        "kernel": jnp.asarray(tc.conv_kernel(t_conv.weight.detach())),
        "bias": jnp.asarray(t_conv.bias.detach().numpy()),
    }
    y_f = f_conv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(y_f).transpose(0, 3, 1, 2), y_t, atol=1e-5
    )


def test_dense_semantics(rng):
    import flax.linen as nn
    import jax.numpy as jnp

    t_lin = torch.nn.Linear(6, 4)
    x = rng.uniform(size=(5, 6)).astype(np.float32)
    with torch.no_grad():
        y_t = t_lin(torch.from_numpy(x)).numpy()
    y_f = nn.Dense(4).apply(
        {"params": {
            "kernel": jnp.asarray(tc.dense_kernel(t_lin.weight.detach())),
            "bias": jnp.asarray(t_lin.bias.detach().numpy()),
        }},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(y_f), y_t, atol=1e-5)


def test_batchnorm_semantics(rng):
    import flax.linen as nn
    import jax.numpy as jnp

    t_bn = torch.nn.BatchNorm2d(4)
    t_bn.running_mean += torch.from_numpy(rng.normal(size=4).astype(np.float32))
    t_bn.running_var *= 2.0
    t_bn.eval()
    x = rng.uniform(size=(2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        y_t = t_bn(torch.from_numpy(x)).numpy()

    sd = {f"bn.{k}": v.detach().numpy() for k, v in
          list(t_bn.named_parameters()) + list(t_bn.named_buffers())}
    p, s = tc.batchnorm("bn", sd)
    y_f = nn.BatchNorm(use_running_average=True, epsilon=1e-5).apply(
        {"params": {k: jnp.asarray(v) for k, v in p.items()},
         "batch_stats": {k: jnp.asarray(v) for k, v in s.items()}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(y_f).transpose(0, 3, 1, 2), y_t, atol=1e-5
    )


def test_convert_state_dict_rules(rng):
    sd = {
        "backbone.conv1.weight": rng.normal(size=(8, 1, 3, 3)).astype(np.float32),
        "head.weight": rng.normal(size=(4, 8)).astype(np.float32),
        "head.bias": rng.normal(size=4).astype(np.float32),
    }
    rules = [
        (r"backbone\.conv1\.weight",
         lambda m, s: {("conv1", "kernel"): tc.conv_kernel(s[m.group(0)])}),
        (r"head\.weight",
         lambda m, s: {("head", "kernel"): tc.dense_kernel(s[m.group(0)])}),
        (r"head\.bias",
         lambda m, s: {("head", "bias"): np.asarray(s[m.group(0)])}),
    ]
    params, stats = tc.convert_state_dict(sd, rules)
    assert params["conv1"]["kernel"].shape == (3, 3, 1, 8)
    assert params["head"]["kernel"].shape == (8, 4)
    assert stats == {}
    # unmatched keys must raise, never silently drop
    sd["extra.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        tc.convert_state_dict(sd, rules)


def test_strip_prefix():
    sd = {"matcher.a.w": 1, "matcher.b.w": 2, "other.c": 3}
    out = tc.strip_prefix(sd, "matcher.")
    assert out == {"a.w": 1, "b.w": 2}
