"""VGG + loss tests (SURVEY.md §4: VGG conv blocks vs torch on random
weights — weight-agnostic because pretrained weights may be unavailable
offline)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfs_tpu.features import (
    VGG_LAYERS, init_vgg_params, vgg_features, save_vgg_params,
    load_vgg_params, gram_matrix, style_gram_targets, style_loss,
    semantic_loss, content_loss, tv_loss,
)
from nfs_tpu.features.vgg import VGG_ARCH


class TestVGG:
    def test_layer_names(self):
        assert VGG_LAYERS[0] == "relu1_1"
        assert VGG_LAYERS[-1] == "relu5_4"
        assert len(VGG_LAYERS) == 16

    def test_feature_shapes(self):
        params = init_vgg_params(0)
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
        feats = vgg_features(params, img,
                             ("relu1_1", "relu2_1", "relu3_1", "relu4_1"))
        assert feats["relu1_1"].shape == (2, 64, 64, 64)
        assert feats["relu2_1"].shape == (2, 32, 32, 128)
        assert feats["relu3_1"].shape == (2, 16, 16, 256)
        assert feats["relu4_1"].shape == (2, 8, 8, 512)

    def test_deterministic_init(self):
        p1 = init_vgg_params(3)
        p2 = init_vgg_params(3)
        np.testing.assert_array_equal(np.asarray(p1["conv3_2"]["w"]),
                                      np.asarray(p2["conv3_2"]["w"]))

    def test_save_load_roundtrip(self, tmp_path):
        params = init_vgg_params(1)
        path = str(tmp_path / "vgg.npz")
        save_vgg_params(path, params)
        loaded = load_vgg_params(path)
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        f1 = vgg_features(params, img, ("relu2_2",))
        f2 = vgg_features(loaded, img, ("relu2_2",))
        np.testing.assert_allclose(np.asarray(f1["relu2_2"]),
                                   np.asarray(f2["relu2_2"]), atol=1e-6)

    def test_matches_torch_on_random_weights(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)
        params = init_vgg_params(0)
        img_np = np.random.default_rng(2).random((1, 33, 35, 3)).astype(
            np.float32)

        # torch VGG-19 stem up to relu2_1, max pool, same weights
        conv_names = ["conv1_1", "conv1_2", "conv2_1"]
        layers = []
        c_in = 3
        for name in conv_names:
            w = np.asarray(params[name]["w"])  # HWIO
            b = np.asarray(params[name]["b"])
            conv = torch.nn.Conv2d(c_in, w.shape[-1], 3, padding=1)
            conv.weight.data = torch.from_numpy(
                w.transpose(3, 2, 0, 1).copy())  # OIHW
            conv.bias.data = torch.from_numpy(b.copy())
            layers.append(conv)
            layers.append(torch.nn.ReLU())
            if name == "conv1_2":
                layers.append(torch.nn.MaxPool2d(2, 2))
            c_in = w.shape[-1]
        net = torch.nn.Sequential(*layers)

        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x_t = torch.from_numpy(
            ((img_np - mean) / std).transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            ref = net(x_t).numpy().transpose(0, 2, 3, 1)

        ours = vgg_features(params, jnp.asarray(img_np), ("relu2_1",),
                            pool="max",
                            precision=jax.lax.Precision.HIGHEST)["relu2_1"]
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                                   rtol=1e-3)


class TestLosses:
    def test_gram_shape_and_symmetry(self):
        f = jax.random.uniform(jax.random.PRNGKey(3), (4, 6, 8))
        g = gram_matrix(f)
        assert g.shape == (8, 8)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g).T, atol=1e-6)

    def test_gram_batched(self):
        f = jax.random.uniform(jax.random.PRNGKey(4), (3, 4, 6, 8))
        g = gram_matrix(f)
        assert g.shape == (3, 8, 8)
        g0 = gram_matrix(f[0])
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g0),
                                   atol=1e-6)

    def test_style_loss_zero_on_match(self):
        params = init_vgg_params(0)
        img = jax.random.uniform(jax.random.PRNGKey(5), (48, 48, 3))
        layers = ("relu1_1", "relu2_1")
        targets = style_gram_targets(params, img, layers)
        feats = vgg_features(params, img[None], layers)
        loss = style_loss(feats, targets, layers, (1.0, 1.0))
        assert float(loss) == pytest.approx(0.0, abs=1e-8)

    def test_style_loss_positive_on_mismatch(self):
        params = init_vgg_params(0)
        img1 = jax.random.uniform(jax.random.PRNGKey(6), (48, 48, 3))
        img2 = jax.random.uniform(jax.random.PRNGKey(7), (48, 48, 3)) ** 3
        layers = ("relu1_1", "relu2_1")
        targets = style_gram_targets(params, img1, layers)
        feats = vgg_features(params, img2[None], layers)
        assert float(style_loss(feats, targets, layers, (1.0, 1.0))) > 0.0

    def test_semantic_loss_channel(self):
        feats = {"relu3_1": jnp.ones((1, 4, 4, 8)).at[..., 2].set(5.0)}
        assert float(semantic_loss(feats, "relu3_1", 2)) == pytest.approx(-5.0)
        assert float(semantic_loss(feats, "relu3_1")) == pytest.approx(-1.5)

    def test_content_loss(self):
        f = {"relu2_1": jax.random.uniform(jax.random.PRNGKey(8),
                                           (2, 8, 8, 4))}
        t = {"relu2_1": f["relu2_1"][0]}
        # view 0 matches the target exactly; loss averages over both views
        assert float(content_loss({"relu2_1": f["relu2_1"][:1]}, t,
                                  "relu2_1")) == pytest.approx(0.0, abs=1e-8)

    def test_tv_loss(self):
        const = jnp.ones((8, 8))
        assert float(tv_loss(const)) == pytest.approx(0.0)
        noisy = jax.random.uniform(jax.random.PRNGKey(9), (8, 8))
        assert float(tv_loss(noisy)) > 0.0

    def test_bf16_feature_path(self):
        params = init_vgg_params(0)
        img = jax.random.uniform(jax.random.PRNGKey(10), (1, 32, 32, 3))
        f32 = vgg_features(params, img, ("relu2_1",))["relu2_1"]
        bf16 = vgg_features(params, img, ("relu2_1",),
                            dtype=jnp.bfloat16)["relu2_1"]
        assert bf16.dtype == jnp.bfloat16
        # grams agree loosely
        g1 = gram_matrix(f32)
        g2 = gram_matrix(bf16)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=0.05, rtol=0.1)
