"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from personalized_text_to_speech_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return create_mesh({"data": 8, "model": 1})


class TestMesh:
    def test_create_mesh_fill(self):
        mesh = create_mesh({"data": -1})
        assert mesh.devices.size == len(jax.devices())

    def test_axes(self, mesh8):
        assert mesh8.axis_names == ("data", "model")
        assert mesh8.shape["data"] == 8

    def test_shard_batch_places_rows(self, mesh8):
        x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
        sharded = shard_batch({"x": x}, mesh8)
        assert sharded["x"].sharding.spec == P("data")
        np.testing.assert_array_equal(np.asarray(sharded["x"]), x)


class TestShardedTrainStep:
    def test_gradients_match_single_device(self, mesh8):
        """Data-parallel grads over the mesh must equal single-device grads
        on the same global batch (the psum inserted by XLA is exact)."""

        def loss_fn(w, x, y):
            pred = jnp.tanh(x @ w)
            return jnp.mean((pred - y) ** 2)

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=(16, 5)), dtype=jnp.float32)
        y = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)

        grad_fn = jax.jit(jax.grad(loss_fn))
        g_single = grad_fn(w, x, y)

        bs = batch_sharding(mesh8)
        repl = replicated(mesh8)
        w_r = jax.device_put(w, repl)
        x_s = jax.device_put(x, bs)
        y_s = jax.device_put(y, bs)
        with mesh8:
            g_sharded = grad_fn(w_r, x_s, y_s)
        np.testing.assert_allclose(
            np.asarray(g_single), np.asarray(g_sharded), atol=1e-6
        )

    def test_spectrogram_shards_over_batch(self, mesh8):
        from personalized_text_to_speech_tpu.ops.spectrogram import (
            MelConfig,
            mel_spectrogram,
        )

        cfg = MelConfig(sampling_rate=8000, n_fft=256, hop_length=64,
                        win_length=256, n_mels=20)
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.uniform(-0.5, 0.5, size=(8, 64 * 16)),
                        dtype=jnp.float32)
        want = np.asarray(jax.jit(lambda a: mel_spectrogram(a, cfg))(y))
        y_s = jax.device_put(y, batch_sharding(mesh8))
        with mesh8:
            got = np.asarray(jax.jit(lambda a: mel_spectrogram(a, cfg))(y_s))
        np.testing.assert_allclose(want, got, atol=1e-5)

    def test_mas_shards_over_batch(self, mesh8):
        from personalized_text_to_speech_tpu.ops.mas import (
            maximum_path,
            maximum_path_numpy,
        )

        rng = np.random.default_rng(2)
        neg = rng.normal(size=(8, 24, 6)).astype(np.float32)
        tl = np.full(8, 6, dtype=np.int32)
        sl = np.full(8, 24, dtype=np.int32)
        want = maximum_path_numpy(neg, tl, sl)
        neg_s = jax.device_put(jnp.asarray(neg), batch_sharding(mesh8))
        tl_s = jax.device_put(jnp.asarray(tl), batch_sharding(mesh8))
        sl_s = jax.device_put(jnp.asarray(sl), batch_sharding(mesh8))
        with mesh8:
            got = np.asarray(maximum_path(neg_s, tl_s, sl_s))
        np.testing.assert_array_equal(got, want)
