"""Tests for schedulers, EMA, fnv hashing, tokenizer, and checkpointing."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdt_policy_tpu.utils.ema import ema_decay, ema_update
from mdt_policy_tpu.utils.fnv import NATIVE, _fnv1_32_py, fnv1_32, fnv1a_32
from mdt_policy_tpu.utils.schedulers import tri_stage_schedule


class TestTriStage:
    def test_phases_match_reference_semantics(self):
        # production config: peak 1e-4, scales 0.1/1e-6, 50k steps, (0.02,0.08,0.9)
        sched = tri_stage_schedule()
        warmup, hold, decay = 1000, 4000, 45000
        # warmup starts at init_lr and ramps linearly (ref tri_stage :130-134)
        assert float(sched(0)) == pytest.approx(1e-5)
        assert float(sched(warmup // 2)) == pytest.approx(
            1e-5 + (1e-4 - 1e-5) * 0.5, rel=1e-3)
        # hold at peak
        assert float(sched(warmup + 10)) == pytest.approx(1e-4)
        # decay stage: cosine from peak to final
        s = warmup + hold + decay // 2
        expected = 1e-10 + 0.5 * (1e-4 - 1e-10) * (1 + math.cos(math.pi / 2))
        assert float(sched(s)) == pytest.approx(expected, rel=1e-3)
        # after decay: final lr
        assert float(sched(warmup + hold + decay + 100)) == pytest.approx(1e-10)


class TestEMA:
    def test_decay_schedule_matches_reference_formula(self):
        # ref ema.py:84-91 with inv_gamma=1, power=2/3, clamp [0, 0.9999]
        for step, expected in [(1, 0.0), (2, 1 - 2 ** (-2 / 3)),
                               (11, 1 - 11 ** (-2 / 3))]:
            assert float(ema_decay(jnp.asarray(step))) == pytest.approx(expected, rel=1e-5)
        assert float(ema_decay(jnp.asarray(10 ** 9))) == pytest.approx(0.9999)

    def test_update_rule(self):
        ema = {"w": jnp.ones((3,))}
        params = {"w": jnp.zeros((3,))}
        out = ema_update(ema, params, decay=0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.9, rtol=1e-6)


class TestFnv:
    def test_native_matches_python(self):
        for s in ["0", "42", "hello", "dict_values([0, 1, 'left'])"]:
            assert fnv1_32(s) == _fnv1_32_py(s)

    def test_known_vectors(self):
        # classic FNV-1 32 test vectors over raw bytes
        assert fnv1_32(b"") == 0x811C9DC5
        assert fnv1_32(b"a") == 0x050C5D7E
        # str hashing goes through UTF-16-LE: "a" -> b"a\x00"
        assert fnv1_32("a") == fnv1_32(b"a\x00")

    def test_fnv1a_differs(self):
        assert fnv1a_32(b"a") != fnv1_32(b"a")


class TestTokenizer:
    def test_clip_golden_ids(self):
        pytest.importorskip("regex")
        from mdt_policy_tpu.utils.clip_tokenizer import tokenize
        try:
            ids = tokenize("a photo of a cat")
        except FileNotFoundError:
            pytest.skip("BPE vocab not available")
        # OpenAI CLIP's canonical tokenization
        np.testing.assert_array_equal(
            ids[0][:7], [49406, 320, 1125, 539, 320, 2368, 49407])
        assert ids.shape == (1, 77)

    def test_roundtrip(self):
        from mdt_policy_tpu.utils.clip_tokenizer import SimpleTokenizer
        try:
            tok = SimpleTokenizer()
        except FileNotFoundError:
            pytest.skip("BPE vocab not available")
        text = "push the red block right"
        ids = tok.encode(text)
        assert tok.decode(ids).strip() == text


class TestCheckpointer:
    def test_save_restore_roundtrip(self, tmp_path):
        from mdt_policy_tpu.utils.checkpoint import Checkpointer, latest_checkpoint
        import flax.struct
        import optax

        class MiniState(flax.struct.PyTreeNode):
            step: jax.Array
            params: dict
            opt_state: tuple
            ema_params: dict
            tx: object = flax.struct.field(pytree_node=False)

        tx = optax.sgd(1e-3)
        params = {"w": jnp.arange(4, dtype=jnp.float32)}
        state = MiniState(step=jnp.asarray(3), params=params,
                          opt_state=tx.init(params),
                          ema_params={"w": jnp.full((4,), 2.0)}, tx=tx)
        ck = Checkpointer(tmp_path / "ckpts", keep=2)
        ck.save(state, metric=1.5)
        state2 = state.replace(step=jnp.asarray(7),
                               params={"w": jnp.full((4,), 9.0)})
        ck.save(state2, metric=0.5)

        ck.wait()  # saves are async: settle before inspecting the directory
        assert latest_checkpoint(tmp_path / "ckpts").name == "7"
        assert ck.best_step() == 3  # higher metric wins (max mode)

        template = state.replace(step=jnp.asarray(0),
                                 params={"w": jnp.zeros(4)},
                                 ema_params={"w": jnp.zeros(4)})
        restored = ck.restore(template)
        assert int(restored.step) == 7
        np.testing.assert_allclose(np.asarray(restored.params["w"]), 9.0)
        restored_best = ck.restore(template, step=ck.best_step())
        np.testing.assert_allclose(np.asarray(restored_best.ema_params["w"]), 2.0)

    def test_load_pretrain_params_partial_merge(self, tmp_path):
        """Warm-start chain: orbax checkpoint dir -> params tree -> partial
        merge (matching path+shape copied, the rest untouched)."""
        from mdt_policy_tpu.training import _load_pretrain_params
        from mdt_policy_tpu.utils.checkpoint import Checkpointer
        from mdt_policy_tpu.utils.misc import initialize_pretrained_weights
        import flax.struct
        import optax

        class MiniState(flax.struct.PyTreeNode):
            step: jax.Array
            params: dict
            opt_state: tuple
            ema_params: dict
            tx: object = flax.struct.field(pytree_node=False)

        tx = optax.sgd(1e-3)
        params = {"enc": {"w": jnp.full((3,), 5.0)}, "head": {"w": jnp.ones((2, 2))}}
        state = MiniState(step=jnp.asarray(2), params=params,
                          opt_state=tx.init(params), ema_params=params, tx=tx)
        ck = Checkpointer(tmp_path / "ckpts", keep=1)
        ck.save(state, wait=True)

        # both forms: the checkpoints/ dir (newest step) and the step dir
        for src in (tmp_path / "ckpts", tmp_path / "ckpts" / "2"):
            pre = _load_pretrain_params(str(src))
            np.testing.assert_allclose(np.asarray(pre["enc"]["w"]), 5.0)

        fresh = {"enc": {"w": jnp.zeros((3,))},          # matches -> copied
                 "head": {"w": jnp.zeros((4, 4))},       # shape mismatch -> kept
                 "extra": {"b": jnp.full((2,), 7.0)}}    # absent -> kept
        merged = initialize_pretrained_weights(fresh, pre)
        np.testing.assert_allclose(np.asarray(merged["enc"]["w"]), 5.0)
        np.testing.assert_allclose(np.asarray(merged["head"]["w"]), 0.0)
        np.testing.assert_allclose(np.asarray(merged["extra"]["b"]), 7.0)

    def test_async_save_restores_without_explicit_wait(self, tmp_path):
        """restore() must settle an in-flight async save by itself."""
        from mdt_policy_tpu.utils.checkpoint import Checkpointer
        import flax.struct
        import optax

        class MiniState(flax.struct.PyTreeNode):
            step: jax.Array
            params: dict
            opt_state: tuple
            ema_params: dict
            tx: object = flax.struct.field(pytree_node=False)

        tx = optax.sgd(1e-3)
        params = {"w": jnp.arange(6, dtype=jnp.float32)}
        state = MiniState(step=jnp.asarray(11), params=params,
                          opt_state=tx.init(params), ema_params=params, tx=tx)
        ck = Checkpointer(tmp_path / "ckpts", keep=1)
        ck.save(state)  # async — no wait
        restored = ck.restore(state.replace(params={"w": jnp.zeros(6)}))
        assert int(restored.step) == 11
        np.testing.assert_allclose(np.asarray(restored.params["w"]),
                                   np.arange(6, dtype=np.float32))
