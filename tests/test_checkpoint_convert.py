"""Reference-checkpoint conversion tests: torch-free reading + numerical
parity of the converted MLP against the reference torch module."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _torch_available():
    try:
        import torch  # noqa

        return True
    except ImportError:
        return False


requires_torch = pytest.mark.skipif(
    not (_torch_available() and os.path.exists("/root/reference/models/nerf.py")),
    reason="torch / reference unavailable")


@requires_torch
def test_torch_free_reader_roundtrip(tmp_path):
    import torch

    from animnerf_tpu.utils.torch_pickle import load_torch_checkpoint

    payload = {
        "state_dict": {
            "a.weight": torch.arange(12, dtype=torch.float32).reshape(3, 4),
            "b.bias": torch.tensor([1.5, -2.0]),
            "c.long": torch.tensor([1, 2, 3], dtype=torch.int64),
        },
        "hyper_parameters": {"lr": 5e-4, "exp_name": "x"},
        "epoch": 3,
    }
    path = str(tmp_path / "t.ckpt")
    torch.save(payload, path)

    loaded = load_torch_checkpoint(path)
    sd = loaded["state_dict"]
    np.testing.assert_allclose(sd["a.weight"],
                               np.arange(12, dtype=np.float32).reshape(3, 4))
    np.testing.assert_allclose(sd["b.bias"], [1.5, -2.0])
    np.testing.assert_array_equal(sd["c.long"], [1, 2, 3])
    assert loaded["hyper_parameters"]["lr"] == 5e-4
    assert loaded["epoch"] == 3


@requires_torch
def test_converted_nerf_matches_reference(tmp_path):
    """Random reference NeRF -> PL-style ckpt -> torch-free convert -> our
    NeRFMLP produces the same rgb/sigma."""
    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from models.nerf import NeRF as RefNeRF
    finally:
        sys.path.pop(0)

    from animnerf_tpu.models.nerf import NeRFMLP
    from animnerf_tpu.tools.convert_checkpoint import convert
    from animnerf_tpu.training.checkpoints import load_params

    torch.manual_seed(0)
    ref = RefNeRF(freqs_xyz=10, freqs_dir=4, use_view=False,
                  deformation_dim=0, apperance_dim=0)
    ref_fine = RefNeRF(freqs_xyz=10, freqs_dir=4, use_view=False)

    sd = {}
    for prefix, mod in (("anim_nerf.nerf.", ref),
                        ("anim_nerf.nerf_fine.", ref_fine)):
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v
    sd["body_model_params.betas.weight"] = torch.randn(1, 10)
    sd["body_model_params.transl.weight"] = torch.randn(7, 3)
    sd["anim_nerf.body_model.v_template"] = torch.randn(10, 3)  # dropped
    ckpt = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": {"exp_name": "p"}}, ckpt)

    out_dir = str(tmp_path / "converted")
    convert(ckpt, out_dir)

    m = NeRFMLP(use_view=False)
    target = {"anim_nerf": {
        "nerf": m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3))),
        "nerf_fine": m.init(jax.random.PRNGKey(1), jnp.zeros((1, 3))),
    }}
    params = load_params(out_dir, target)

    x = np.random.default_rng(0).normal(scale=0.4, size=(64, 3)).astype(np.float32)
    with torch.no_grad():
        rgb_ref, sigma_ref = ref(torch.from_numpy(x))
        rgbf_ref, sigmaf_ref = ref_fine(torch.from_numpy(x))

    rgb, sigma = m.apply(params["anim_nerf"]["nerf"], jnp.asarray(x))
    rgbf, sigmaf = m.apply(params["anim_nerf"]["nerf_fine"], jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(sigma), sigma_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sigmaf), sigmaf_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(rgbf), rgbf_ref.numpy(), atol=2e-4)

    # body params converted too
    import numpy as np2

    body = dict(np2.load(os.path.join(out_dir, "body_params.npz")))
    assert body["betas"].shape == (1, 10)
    assert body["transl"].shape == (7, 3)
