"""Pretrained-weight grafting: torch checkpoints -> policy variable trees."""

import numpy as np
import torch

import jax

from tests.test_encoders import BLOCKS, GNResNetEncoderT


def test_graft_ddppo_depth(tmp_path, rng):
    import jax.numpy as jnp

    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.models.encoders.visual import DepthEncoder
    from robo_vln_tpu.utils.pretrained import graft_pretrained

    # build a habitat-layout torch encoder and save a DDPPO-style ckpt
    torch.manual_seed(0)
    tmod = GNResNetEncoderT(blocks=(3, 4, 6, 3), spatial=64)
    sd = {
        f"actor_critic.net.visual_encoder.{k}": v
        for k, v in tmod.state_dict().items()
    }
    ckpt = str(tmp_path / "ddppo.pth")
    torch.save({"state_dict": sd}, ckpt)

    mc = get_config().clone().defrost().MODEL
    mc.DEPTH_ENCODER.ddppo_checkpoint = ckpt
    mc.RGB_ENCODER.pretrained_weights = ""
    mc.BERT.pretrained_weights = ""

    enc = DepthEncoder(output_size=8, spatial_size=64)
    x = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), {"depth": x})

    grafted, prov = graft_pretrained(dict(variables), mc)
    assert prov["ddppo_depth"]["status"] == "loaded"
    assert prov["imagenet_rgb"]["status"] == "not_in_model"
    # the backbone weights must now equal the torch ones
    got = np.asarray(
        grafted["params"]["visual_encoder"]["backbone"]["conv1"]["kernel"]
    )
    want = tmod.backbone.conv1[0].weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want)

    # and the flax forward matches the torch forward (port correctness e2e)
    with torch.no_grad():
        ref = (
            tmod(torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    from robo_vln_tpu.models.encoders.resnet import GNResNetEncoder

    out = GNResNetEncoder(spatial_size=64).apply(
        {"params": grafted["params"]["visual_encoder"]}, x
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)


def test_graft_missing_files_noop(tmp_path, rng):
    import jax.numpy as jnp

    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.models.encoders.visual import SimpleCNN
    from robo_vln_tpu.utils.pretrained import graft_pretrained

    mc = get_config().clone().defrost().MODEL
    mc.DEPTH_ENCODER.ddppo_checkpoint = str(tmp_path / "missing.pth")
    mc.RGB_ENCODER.pretrained_weights = ""
    mc.BERT.pretrained_weights = ""
    enc = SimpleCNN(8, "depth")
    x = jnp.asarray(rng.random((1, 64, 64, 1)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), {"depth": x})
    grafted, prov = graft_pretrained(dict(variables), mc)
    # SimpleCNN has no visual_encoder/cnn/embedding_layer subtree at all
    assert all(v["status"] == "not_in_model" for v in prov.values())
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables["params"], grafted["params"],
    )
