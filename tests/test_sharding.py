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


@pytest.fixture(scope="module")
def mesh8_tp():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return create_mesh({"data": 4, "model": 2})


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


class TestTPSpecs:
    """Unit tests for the tensor-parallel spec derivation (parallel/tp.py)."""

    def _params(self):
        return {
            "conv": {  # Conv1d-style weight norm: g indexes OUT channels
                "v": np.zeros((3, 4, 8), np.float32),
                "g": np.zeros((8,), np.float32),
                "bias": np.zeros((8,), np.float32),
            },
            "convT": {  # ConvTranspose1d-style: g indexes IN channels
                "v": np.zeros((5, 6, 8), np.float32),
                "g": np.zeros((6,), np.float32),
                "bias": np.zeros((8,), np.float32),
            },
            "post": {  # out dim 1: not divisible → fully replicated
                "kernel": np.zeros((7, 8, 1), np.float32),
                "bias": np.zeros((1,), np.float32),
            },
            "emb": {"embedding": np.zeros((10, 8), np.float32)},
            "norm": {"gamma": np.zeros((8,), np.float32)},
        }

    def test_spec_rules(self):
        from personalized_text_to_speech_tpu.parallel import tp

        specs = tp.param_pspecs(self._params(), tp_size=2)
        assert specs[("conv", "v")] == P(None, None, "model")
        assert specs[("conv", "g")] == P("model")
        assert specs[("conv", "bias")] == P("model")
        assert specs[("convT", "v")] == P(None, None, "model")
        assert specs[("convT", "g")] == P()       # indexes in-channels
        assert specs[("convT", "bias")] == P("model")
        assert specs[("post", "kernel")] == P()   # out=1 not divisible
        assert specs[("post", "bias")] == P()
        assert specs[("emb", "embedding")] == P(None, "model")
        assert specs[("norm", "gamma")] == P()    # no sibling kernel

    def test_tp1_replicates_everything(self):
        from personalized_text_to_speech_tpu.parallel import tp

        specs = tp.param_pspecs(self._params(), tp_size=1)
        assert all(s == P() for s in specs.values())

    def test_tree_pspecs_mirrors_into_opt_state(self):
        from personalized_text_to_speech_tpu.parallel import tp

        params = self._params()
        specs = tp.param_pspecs(params, tp_size=2)
        # Adam-like moments mirror the param tree under a wrapper key
        state = {"mu": params, "nu": params, "count": np.zeros(())}
        spec_tree = tp.tree_pspecs(state, specs)
        assert spec_tree["mu"]["conv"]["v"] == P(None, None, "model")
        assert spec_tree["nu"]["emb"]["embedding"] == P(None, "model")
        assert spec_tree["count"] == P()


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

    def test_real_gan_step_sharded_equals_single(self, mesh8):
        """THE data-parallel correctness test: the actual fused GAN train
        step (generator fwd + MAS + D update + G update through vjp) run on
        the 8-device mesh must produce numerically the same GRADIENTS and
        loss metrics as the identical unsharded step on one device.  A
        sign-flipped psum, wrong mean/sum normalization, or a wrong batch
        axis shows up here as a gradient divergence.  Gradients are the
        comparison target (not post-Adam params): at step 1 Adam's
        bias-corrected update is ±lr·sign(g), so fp reduction-order noise
        on near-zero gradient coordinates flips whole lr-sized steps —
        params get only a loose lr-scale sanity bound."""
        from personalized_text_to_speech_tpu.models.discriminator import (
            MultiPeriodDiscriminator,
        )
        from personalized_text_to_speech_tpu.train.state import (
            create_train_state,
        )
        from personalized_text_to_speech_tpu.train.step import (
            Batch,
            make_train_step,
        )
        from tests.test_model import tiny_model
        from tests.test_train import HOP, tiny_hps

        hps = tiny_hps()
        g_model = tiny_model()
        d_model = MultiPeriodDiscriminator(periods=(2, 3))

        rng = jax.random.PRNGKey(0)
        b, tt, ts = 8, 6, 24
        g_params = g_model.init(
            {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
            jnp.ones((2, tt), jnp.int32), jnp.array([6, 5]),
            jnp.zeros((2, ts, 33)), jnp.array([24, 20]), jnp.array([0, 1]),
        )["params"]
        wav0 = jnp.zeros((2, 8 * HOP))
        d_params = d_model.init(rng, wav0, wav0)["params"]

        def fresh_states():
            return (
                create_train_state(g_model.apply, g_params, hps, 4),
                create_train_state(d_model.apply, d_params, hps, 4),
            )

        rng_np = np.random.default_rng(3)
        t = np.linspace(0, 8, ts * HOP)
        wav_data = np.stack(
            [
                0.5 * np.sin(2 * np.pi * (20 + 3 * i) * t)
                for i in range(b)
            ]
        ).astype(np.float32)
        batch = Batch(
            text=jnp.asarray(rng_np.integers(1, 10, (b, tt)), jnp.int32),
            text_lengths=jnp.asarray(
                rng_np.integers(4, tt + 1, (b,)), jnp.int32
            ),
            wav=jnp.asarray(wav_data),
            wav_lengths=jnp.asarray(
                (rng_np.integers(ts - 6, ts + 1, (b,))) * HOP, jnp.int32
            ),
            sid=jnp.asarray(rng_np.integers(0, 4, (b,)), jnp.int32),
        )

        step = jax.jit(
            make_train_step(g_model, d_model, hps, debug_grads=True),
            donate_argnums=(),
        )

        # --- single device -------------------------------------------------
        g1, d1 = fresh_states()
        g1, d1, m1 = step(g1, d1, batch, jax.random.PRNGKey(100))

        # --- 8-device mesh, batch sharded, params replicated ----------------
        bs = batch_sharding(mesh8)
        repl = replicated(mesh8)
        g8, d8 = fresh_states()
        g8 = jax.device_put(g8, repl)
        d8 = jax.device_put(d8, repl)
        batch_s = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, bs), batch
        )
        with mesh8:
            g8, d8, m8 = step(g8, d8, batch_s, jax.random.PRNGKey(100))

        for k in ("loss/g/total", "loss/d/total", "grad_norm_g", "grad_norm_d"):
            np.testing.assert_allclose(
                float(m1[k]), float(m8[k]), rtol=2e-4, atol=2e-4, err_msg=k
            )
        # gradient trees must match tightly (psum over shards == batch sum)
        for name in ("_grads_g", "_grads_d"):
            leaves1 = jax.tree_util.tree_leaves(m1[name])
            leaves8 = jax.tree_util.tree_leaves(m8[name])
            assert len(leaves1) == len(leaves8)
            scale = max(
                float(np.abs(np.asarray(l)).max()) for l in leaves1
            )
            for a, bv in zip(leaves1, leaves8):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(bv),
                    rtol=1e-4, atol=1e-6 * max(scale, 1.0), err_msg=name,
                )
        # params after the Adam update: loose lr-scale sanity bound only
        lr = hps.train.learning_rate
        for a, bv in zip(
            jax.tree_util.tree_leaves(g1.params)
            + jax.tree_util.tree_leaves(d1.params),
            jax.tree_util.tree_leaves(g8.params)
            + jax.tree_util.tree_leaves(d8.params),
        ):
            assert float(np.abs(np.asarray(a) - np.asarray(bv)).max()) < 3 * lr

    def test_real_gan_step_tp_dp_equals_single(self, mesh8_tp):
        """Tensor-parallel correctness: the SAME fused GAN step with params
        sharded over the `model` axis (out-channel column parallelism,
        parallel/tp.py) on a data×model = 4×2 mesh must reproduce the
        single-device gradients.  GSPMD owns the collectives; this pins the
        annotation down as numerically transparent."""
        from personalized_text_to_speech_tpu.models.discriminator import (
            MultiPeriodDiscriminator,
        )
        from personalized_text_to_speech_tpu.parallel import tp
        from personalized_text_to_speech_tpu.train.state import (
            create_train_state,
        )
        from personalized_text_to_speech_tpu.train.step import (
            Batch,
            make_train_step,
        )
        from tests.test_model import tiny_model
        from tests.test_train import HOP, tiny_hps

        hps = tiny_hps()
        g_model = tiny_model()
        d_model = MultiPeriodDiscriminator(periods=(2, 3))

        rng = jax.random.PRNGKey(0)
        b, tt, ts = 8, 6, 24
        g_params = g_model.init(
            {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
            jnp.ones((2, tt), jnp.int32), jnp.array([6, 5]),
            jnp.zeros((2, ts, 33)), jnp.array([24, 20]), jnp.array([0, 1]),
        )["params"]
        wav0 = jnp.zeros((2, 8 * HOP))
        d_params = d_model.init(rng, wav0, wav0)["params"]

        # the annotation must actually shard something non-trivial
        sharded_n, total_n = tp.count_sharded(g_params, mesh8_tp)
        assert sharded_n > total_n // 4, (sharded_n, total_n)

        rng_np = np.random.default_rng(3)
        t = np.linspace(0, 8, ts * HOP)
        wav_data = np.stack(
            [0.5 * np.sin(2 * np.pi * (20 + 3 * i) * t) for i in range(b)]
        ).astype(np.float32)
        batch = Batch(
            text=jnp.asarray(rng_np.integers(1, 10, (b, tt)), jnp.int32),
            text_lengths=jnp.asarray(
                rng_np.integers(4, tt + 1, (b,)), jnp.int32
            ),
            wav=jnp.asarray(wav_data),
            wav_lengths=jnp.asarray(
                (rng_np.integers(ts - 6, ts + 1, (b,))) * HOP, jnp.int32
            ),
            sid=jnp.asarray(rng_np.integers(0, 4, (b,)), jnp.int32),
        )

        step = jax.jit(
            make_train_step(g_model, d_model, hps, debug_grads=True),
            donate_argnums=(),
        )

        g1 = create_train_state(g_model.apply, g_params, hps, 4)
        d1 = create_train_state(d_model.apply, d_params, hps, 4)
        _, _, m1 = step(g1, d1, batch, jax.random.PRNGKey(100))

        g_tp = tp.shard_pytree(
            create_train_state(g_model.apply, g_params, hps, 4), mesh8_tp
        )
        d_tp = tp.shard_pytree(
            create_train_state(d_model.apply, d_params, hps, 4), mesh8_tp
        )
        batch_s = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, batch_sharding(mesh8_tp)), batch
        )
        with mesh8_tp:
            _, _, m_tp = step(g_tp, d_tp, batch_s, jax.random.PRNGKey(100))

        for k in ("loss/g/total", "loss/d/total", "grad_norm_g", "grad_norm_d"):
            np.testing.assert_allclose(
                float(m1[k]), float(m_tp[k]), rtol=2e-4, atol=2e-4, err_msg=k
            )
        for name in ("_grads_g", "_grads_d"):
            leaves1 = jax.tree_util.tree_leaves(m1[name])
            leaves_tp = jax.tree_util.tree_leaves(m_tp[name])
            assert len(leaves1) == len(leaves_tp)
            scale = max(
                float(np.abs(np.asarray(l)).max()) for l in leaves1
            )
            for a, bv in zip(leaves1, leaves_tp):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(bv),
                    rtol=2e-4, atol=2e-6 * max(scale, 1.0), err_msg=name,
                )

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


class TestSequenceParallel:
    """Sequence parallelism (parallel/sp.py): frame/sample axis sharded over
    the `model` axis must be numerically transparent — same gradients as the
    single-device step.  GSPMD owns the halo exchanges at conv boundaries;
    the step pins one anchor constraint on the derived spectrogram plus the
    segment-phase batch re-pin (train/step.py ``_constrain_seg``)."""

    @pytest.fixture(scope="class")
    def mesh8_sp(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        return create_mesh({"data": 2, "model": 4})

    @pytest.fixture(scope="class")
    def sp_case(self):
        """Tiny GAN models + a real batch, shared across the SP tests."""
        from personalized_text_to_speech_tpu.models.discriminator import (
            MultiPeriodDiscriminator,
        )
        from personalized_text_to_speech_tpu.train.step import Batch
        from tests.test_model import tiny_model
        from tests.test_train import HOP, tiny_hps

        hps = tiny_hps()
        g_model = tiny_model()
        d_model = MultiPeriodDiscriminator(periods=(2, 3))

        rng = jax.random.PRNGKey(0)
        b, tt, ts = 4, 6, 24
        g_params = g_model.init(
            {"params": rng, "noise": rng, "slice": rng, "dropout": rng},
            jnp.ones((2, tt), jnp.int32), jnp.array([6, 5]),
            jnp.zeros((2, ts, 33)), jnp.array([24, 20]), jnp.array([0, 1]),
        )["params"]
        wav0 = jnp.zeros((2, 8 * HOP))
        d_params = d_model.init(rng, wav0, wav0)["params"]

        rng_np = np.random.default_rng(5)
        t = np.linspace(0, 8, ts * HOP)
        wav_data = np.stack(
            [0.5 * np.sin(2 * np.pi * (18 + 5 * i) * t) for i in range(b)]
        ).astype(np.float32)
        batch = Batch(
            text=jnp.asarray(rng_np.integers(1, 10, (b, tt)), jnp.int32),
            text_lengths=jnp.asarray(
                rng_np.integers(4, tt + 1, (b,)), jnp.int32
            ),
            wav=jnp.asarray(wav_data),
            wav_lengths=jnp.asarray(
                (rng_np.integers(ts - 6, ts + 1, (b,))) * HOP, jnp.int32
            ),
            sid=jnp.asarray(rng_np.integers(0, 4, (b,)), jnp.int32),
        )
        return hps, g_model, d_model, g_params, d_params, batch

    @staticmethod
    def _run_pair(mesh, case, **step_kwargs):
        """Run the step single-device and SP-sharded; return both metrics."""
        from jax.sharding import NamedSharding

        from personalized_text_to_speech_tpu.parallel.sp import shard_batch_sp
        from personalized_text_to_speech_tpu.train.state import (
            create_train_state,
        )
        from personalized_text_to_speech_tpu.train.step import make_train_step

        hps, g_model, d_model, g_params, d_params, batch = case

        # --- single device, no constraint --------------------------------
        step1 = jax.jit(
            make_train_step(
                g_model, d_model, hps, debug_grads=True, **step_kwargs
            ),
            donate_argnums=(),
        )
        g1 = create_train_state(g_model.apply, g_params, hps, 4)
        d1 = create_train_state(d_model.apply, d_params, hps, 4)
        _, _, m1 = step1(g1, d1, batch, jax.random.PRNGKey(100))

        # --- data=2 × model=4 mesh, wav TIME-sharded ----------------------
        sp_spec = NamedSharding(mesh, P("data", "model", None))
        step_sp = jax.jit(
            make_train_step(
                g_model, d_model, hps, debug_grads=True, sp_spec=sp_spec,
                **step_kwargs,
            ),
            donate_argnums=(),
        )
        repl = replicated(mesh)
        g8 = jax.device_put(
            create_train_state(g_model.apply, g_params, hps, 4), repl
        )
        d8 = jax.device_put(
            create_train_state(d_model.apply, d_params, hps, 4), repl
        )
        batch_sp = shard_batch_sp(batch, mesh)
        assert batch_sp.wav.sharding.spec == P("data", "model")
        with mesh:
            _, _, m8 = step_sp(g8, d8, batch_sp, jax.random.PRNGKey(100))
        return m1, m8

    @staticmethod
    def _assert_match(m1, m8):
        for k in ("loss/g/total", "loss/d/total", "grad_norm_g", "grad_norm_d"):
            np.testing.assert_allclose(
                float(m1[k]), float(m8[k]), rtol=2e-4, atol=2e-4, err_msg=k
            )
        # this test caught a real XLA SPMD hazard once: with the segments
        # pinned model-REPLICATED, the weight grads of disc_s's GROUPED
        # convs came back EXACTLY ×4 (once per model shard; biases stayed
        # exact) — _constrain_seg now shards the segment batch over
        # (data, model) instead.  Keep the tolerance tight so any
        # replication mis-accounting resurfaces as a failure.
        for name, af in (("_grads_g", 2e-6), ("_grads_d", 2e-6)):
            leaves1 = jax.tree_util.tree_leaves(m1[name])
            leaves8 = jax.tree_util.tree_leaves(m8[name])
            assert len(leaves1) == len(leaves8)
            scale = max(
                float(np.abs(np.asarray(l)).max()) for l in leaves1
            )
            for a, bv in zip(leaves1, leaves8):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(bv),
                    rtol=2e-4, atol=af * max(scale, 1.0), err_msg=name,
                )

    def test_real_gan_step_sp_equals_single(self, mesh8_sp, sp_case):
        m1, m8 = self._run_pair(mesh8_sp, sp_case)
        self._assert_match(m1, m8)

    def test_sp_accum_equals_single(self, mesh8_sp, sp_case):
        """SP composes with gradient accumulation: the two-phase microbatch
        scan re-derives the spectrogram per micro and re-applies both SP
        pins inside the scan body (train/step.py phase1/phase2) —
        deterministic=True because dropout masks are the intended
        fused-vs-accum divergence (tests/test_train_accum.py)."""
        m1, m8 = self._run_pair(
            mesh8_sp, sp_case, accum_steps=2, deterministic=True
        )
        self._assert_match(m1, m8)
