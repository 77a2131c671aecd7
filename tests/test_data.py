"""Data-pipeline tests over a synthetic on-disk CALVIN dataset: extraction,
index building, chunk assembly semantics (ExtendedDiskDataset parity), window
determinism, collation, and on-device preprocessing."""

from pathlib import Path

import numpy as np
import pytest

from mdt_policy_tpu.data import (
    BatchLoader,
    CalvinDataset,
    Preprocessor,
    collate,
    extract_by_key,
    get_validation_window_size,
    sample_window_size,
)
from mdt_policy_tpu.utils.fnv import fnv1_32

H = 16  # tiny frames


@pytest.fixture(scope="module")
def calvin_dir(tmp_path_factory):
    """Two episodes: frames [0, 80) and [80, 140), training split layout."""
    root = tmp_path_factory.mktemp("calvin") / "training"
    root.mkdir()
    rng = np.random.default_rng(0)
    bounds = np.array([[0, 79], [80, 139]])
    np.save(root / "ep_start_end_ids.npy", bounds)
    for i in range(140):
        np.savez(
            root / f"episode_{i:07d}.npz",
            rgb_static=rng.integers(0, 255, (H, H, 3), dtype=np.uint8),
            rgb_gripper=rng.integers(0, 255, (H, H, 3), dtype=np.uint8),
            robot_obs=np.full((15,), i, np.float32),
            scene_obs=np.zeros((24,), np.float32),
            rel_actions=np.full((7,), i, np.float32),
        )
    lang = {
        "info": {"indx": [(0, 79), (80, 139)]},
        "language": {"emb": rng.normal(size=(2, 1, 384)).astype(np.float32),
                     "ann": ["open the drawer", "push the red block right"]},
    }
    lang_dir = root / "lang_clip_resnet50"
    lang_dir.mkdir()
    np.save(lang_dir / "auto_lang_ann.npy", lang, allow_pickle=True)
    extract_by_key(root, "rel_actions")
    return root


def make_ds(calvin_dir, key="vis", **kw):
    defaults = dict(min_window_size=21, max_window_size=30, obs_seq_len=1,
                    action_seq_len=10, img_gen_frame_diff=3,
                    use_extracted_rel_actions=True, seed=0)
    defaults.update(kw)
    return CalvinDataset(calvin_dir, key=key, **defaults)


class TestDataset:
    def test_vision_index_counts(self, calvin_dir):
        ds = make_ds(calvin_dir)
        # per episode: start .. end+1-min_window (ref disk_dataset.py:155-158)
        expected = len(range(0, 79 + 1 - 21)) + len(range(80, 139 + 1 - 21))
        assert len(ds) == expected == 98

    def test_sample_structure_and_action_slicing(self, calvin_dir):
        ds = make_ds(calvin_dir)
        s = ds[0]  # start frame 0
        assert s["rgb_static"].shape == (2, H, H, 3)  # obs + goal frame
        assert s["gen_static"].shape == (H, H, 3)
        assert s["actions"].shape == (10, 7)
        # actions are rows [start+obs_seq_len-1, +10) = frames 0..9
        np.testing.assert_array_equal(s["actions"][:, 0], np.arange(10, dtype=np.float32))
        # gen frame = start + obs_seq_len + diff - 1 = frame 3
        assert int(s["future_frame_diff"]) == 3

    def test_goal_frame_clipped_to_episode_end(self, calvin_dir):
        ds = make_ds(calvin_dir)
        # robot_obs[1] is the goal frame's robot_obs (filled with frame index)
        s = ds[len(ds) - 1]  # last lookup index of 2nd episode
        goal_frame_idx = s["robot_obs"][-1, 0]
        assert goal_frame_idx <= 139

    def test_lang_dataset(self, calvin_dir):
        ds = make_ds(calvin_dir, key="lang")
        s = ds[0]
        assert s["lang_text"] == "open the drawer"
        assert s["lang_emb"].shape == (384,)

    def test_extracted_matches_npz(self, calvin_dir):
        d1 = make_ds(calvin_dir, use_extracted_rel_actions=True)
        d2 = make_ds(calvin_dir, use_extracted_rel_actions=False)
        np.testing.assert_array_equal(d1[5]["actions"], d2[5]["actions"])


class TestWindows:
    def test_validation_hash_matches_formula(self):
        for idx in [0, 7, 12345]:
            w = get_validation_window_size(idx, 21, 50)
            assert w == 21 + fnv1_32(str(idx)) % 30
            assert 21 <= w <= 50

    def test_geometric_in_range_and_boundary_clipped(self):
        lookup = np.arange(100)
        rng = np.random.default_rng(0)
        for idx in [0, 50, 95]:
            w = sample_window_size(lookup, idx, 21, 50, validation=False,
                                   strategy="geometric", rng=rng)
            assert 21 <= w <= 50
        # idx near the end: max window shrinks
        w = sample_window_size(lookup, 78, 21, 50, validation=True)
        assert w <= 21 + (100 - 78 - 1)


class TestLoaderAndPreprocess:
    def test_collate_and_loader(self, calvin_dir):
        ds = make_ds(calvin_dir, key="lang")
        tok = lambda texts, n: np.zeros((len(texts), n), np.int32)
        loader = BatchLoader(ds, batch_size=3, tokenizer=tok, context_length=8)
        batch = next(iter(loader))
        loader.close()
        assert batch["rgb_static"].shape == (3, 2, H, H, 3)
        assert batch["lang_tokens"].shape == (3, 8)
        assert batch["actions"].shape == (3, 10, 7)

    def test_preprocessor_shapes(self, calvin_dir):
        import jax
        ds = make_ds(calvin_dir)
        batch = collate([ds[0], ds[1]])
        pp = Preprocessor(static_size=32, gripper_size=24, gen_size=16,
                          static_pad=2, gripper_pad=1)
        out = pp.train_batch(jax.random.PRNGKey(0), batch)
        assert out["rgb_static"].shape == (2, 2, 32, 32, 3)
        assert out["rgb_gripper"].shape == (2, 2, 24, 24, 3)
        assert out["gen_static"].shape == (2, 16, 16, 3)
        # normalized: roughly zero-centered
        assert abs(float(np.mean(np.asarray(out["rgb_static"])))) < 2.0
        ev = pp.eval_batch(batch)
        assert ev["rgb_static"].shape == (2, 2, 32, 32, 3)


@pytest.fixture()
def extracted_dir(tmp_path):
    """Validation-split dataset WITH extracted frame arrays (fast path);
    validation => hash-deterministic windows, so batch/per-sample parity is
    exact."""
    from mdt_policy_tpu.data.bench_loader import generate_dataset
    from mdt_policy_tpu.data.extract import extract_frames
    root = tmp_path / "validation"
    generate_dataset(root, 120, static_hw=32, gripper_hw=24, episode_len=60,
                     with_lang=True)
    extract_by_key(root, "rel_actions")
    extract_frames(root)
    return root


class TestBatchGather:
    def test_get_batch_matches_getitem(self, extracted_dir):
        ds = CalvinDataset(extracted_dir, key="vis", min_window_size=21,
                           max_window_size=30, img_gen_frame_diff=3)
        assert ds.ex_frames is not None
        idxs = np.asarray([0, 3, 17, len(ds) - 1])
        batch = ds.get_batch(idxs)
        singles = [ds[int(i)] for i in idxs]
        for k in ("rgb_static", "rgb_gripper", "gen_static", "gen_gripper",
                  "actions", "robot_obs", "future_frame_diff"):
            np.testing.assert_array_equal(
                batch[k], np.stack([s[k] for s in singles]), err_msg=k)

    def test_get_batch_lang(self, extracted_dir):
        ds = CalvinDataset(extracted_dir, key="lang", min_window_size=21,
                           max_window_size=30)
        batch = ds.get_batch(np.asarray([0, 1]))
        assert batch["lang_emb"].shape == (2, 384)
        assert len(batch["lang_text"]) == 2

    def test_get_batch_none_without_extraction(self, calvin_dir):
        ds = make_ds(calvin_dir)  # fixture has no extracted frames
        assert ds.get_batch(np.asarray([0, 1])) is None


class _IdxDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"idx": np.asarray(i)}


class TestEpochSemantics:
    def test_epoch_permutation_without_replacement(self):
        loader = BatchLoader(_IdxDataset(), 5, seed=0, prefetch=1)
        it = iter(loader)
        epoch1 = np.concatenate([next(it)["idx"], next(it)["idx"]])
        epoch2 = np.concatenate([next(it)["idx"], next(it)["idx"]])
        loader.close()
        # each epoch visits every index exactly once, in a new order
        assert sorted(epoch1.tolist()) == list(range(10))
        assert sorted(epoch2.tolist()) == list(range(10))
        assert epoch1.tolist() != epoch2.tolist()

    def test_start_batch_fast_forwards_the_stream(self):
        # the resumed stream must equal the tail of the uninterrupted one,
        # including across an epoch boundary (2 batches/epoch here)
        full = BatchLoader(_IdxDataset(), 5, seed=3, prefetch=1)
        it = iter(full)
        reference = [next(it)["idx"].tolist() for _ in range(6)]
        full.close()
        for start in (1, 3, 4):  # mid-epoch, epoch-skip, mid-later-epoch
            resumed = BatchLoader(_IdxDataset(), 5, seed=3, prefetch=1,
                                  start_batch=start)
            got = [next(iter(resumed))["idx"].tolist()
                   for _ in range(6 - start)]
            resumed.close()
            assert got == reference[start:], f"start_batch={start}"

    def test_device_prefetcher_order_keys_and_errors(self):
        import jax
        from mdt_policy_tpu.data.loader import DevicePrefetcher

        key = jax.random.PRNGKey(0)
        seen_keys = []

        def device_fn(k, raw):
            seen_keys.append(np.asarray(jax.random.key_data(k)).tolist())
            return {"v": raw["v"] + 1}

        raws = [{"v": np.asarray(i)} for i in range(5)]
        pf = DevicePrefetcher(iter(raws), device_fn, key, depth=2)
        out = [next(pf)["v"] for _ in range(5)]
        pf.close()
        # order preserved, fn applied
        assert [int(v) for v in out] == [1, 2, 3, 4, 5]
        # per-batch keys are distinct fold_ins of the base key
        expect = [np.asarray(jax.random.key_data(jax.random.fold_in(key, i))).tolist()
                  for i in range(5)]
        assert seen_keys == expect

        # an exception in the pipeline propagates to the consumer
        def boom(k, raw):
            raise RuntimeError("decode failed")

        pf = DevicePrefetcher(iter(raws), boom, key)
        with pytest.raises(RuntimeError, match="decode failed"):
            next(pf)
        pf.close()

    def test_sharded_loaders_are_disjoint_and_complete(self):
        a = BatchLoader(_IdxDataset(), 5, seed=0, shard_index=0, num_shards=2,
                        prefetch=1)
        b = BatchLoader(_IdxDataset(), 5, seed=0, shard_index=1, num_shards=2,
                        prefetch=1)
        ia, ib = next(iter(a))["idx"], next(iter(b))["idx"]
        a.close(); b.close()
        union = set(ia.tolist()) | set(ib.tolist())
        assert len(set(ia.tolist()) & set(ib.tolist())) == 0
        assert union == set(range(10))


class TestAugVariantGuards:
    """Error paths of the DrQ-variant embedding cache
    (data/extract_embeddings.py --aug-variants + CalvinDataset plumbing)."""

    def test_missing_aug_arrays_is_loud(self, calvin_dir, tmp_path):
        import shutil
        root = tmp_path / "training"
        shutil.copytree(calvin_dir, root)
        ex = root / "extracted"
        # clean embedding arrays present, aug arrays absent
        n = 140
        np.save(ex / "ep_voltron_tokens.npy",
                np.zeros((n, 8, 16), np.uint16))
        np.save(ex / "ep_clip_img_emb.npy", np.zeros((n, 4), np.float32))
        with pytest.raises(FileNotFoundError, match="aug"):
            make_ds(root, use_extracted_embeddings=True,
                    embedding_aug_variants=2)

    def test_requesting_more_variants_than_cached(self, calvin_dir, tmp_path):
        import shutil
        root = tmp_path / "training"
        shutil.copytree(calvin_dir, root)
        ex = root / "extracted"
        n = 140
        np.save(ex / "ep_voltron_tokens.npy", np.zeros((n, 8, 16), np.uint16))
        np.save(ex / "ep_clip_img_emb.npy", np.zeros((n, 4), np.float32))
        np.save(ex / "ep_voltron_tokens_aug.npy",
                np.zeros((n, 2, 8, 16), np.uint16))
        np.save(ex / "ep_clip_img_emb_aug.npy",
                np.zeros((n, 2, 4), np.float32))
        with pytest.raises(ValueError, match="variants"):
            make_ds(root, use_extracted_embeddings=True,
                    embedding_aug_variants=3)
        # asking for fewer than cached is fine (uses the first K)
        ds = make_ds(root, use_extracted_embeddings=True,
                     embedding_aug_variants=2)
        assert ds.aug_variants == 2


def test_agent_config_nested_dict_coercion():
    """YAML/CLI agent_overrides deliver nested blocks as dicts; the frozen
    config coerces them and stays hashable (it is a static jit constant)."""
    from mdt_policy_tpu.agents.config import (LRSchedulerConfig, MDTVConfig,
                                              OptimizerConfig)

    c = MDTVConfig(optimizer={"learning_rate": 1e-3, "betas": [0.9, 0.99]},
                   lr_scheduler={"total_steps": 300},
                   clip_rn_layers=[3, 4, 6, 3])
    assert isinstance(c.optimizer, OptimizerConfig)
    assert c.optimizer.betas == (0.9, 0.99)
    assert isinstance(c.lr_scheduler, LRSchedulerConfig)
    assert c.lr_scheduler.total_steps == 300
    assert c.clip_rn_layers == (3, 4, 6, 3)
    hash(c)  # must stay usable as a jit static constant
