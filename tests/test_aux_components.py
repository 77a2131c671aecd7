"""Tests for auxiliary components: memory cache, misc utils, lang annotator,
and the CALVIN validation-annotation table."""

import numpy as np
import pytest

from mdt_policy_tpu.data.lang_annotator import (
    annotate_episodes,
    write_auto_lang_ann,
    write_embeddings,
)
from mdt_policy_tpu.utils.misc import (
    get_portion_of_batch_ids,
    initialize_pretrained_weights,
)


class TestMemoryCache:
    def test_cache_hits_and_eviction(self, tmp_path):
        # synthetic micro-dataset
        root = tmp_path / "training"
        root.mkdir()
        np.save(root / "ep_start_end_ids.npy", np.array([[0, 39]]))
        for i in range(40):
            np.savez(root / f"episode_{i:07d}.npz",
                     rgb_static=np.zeros((8, 8, 3), np.uint8),
                     rgb_gripper=np.zeros((8, 8, 3), np.uint8),
                     robot_obs=np.zeros(15, np.float32),
                     scene_obs=np.zeros(24, np.float32),
                     rel_actions=np.full(7, i, np.float32))
        from mdt_policy_tpu.data import CalvinDataset
        from mdt_policy_tpu.data.memory_cache import CachedCalvinDataset
        ds = CalvinDataset(root, min_window_size=5, max_window_size=8,
                           use_extracted_rel_actions=False)
        cds = CachedCalvinDataset(ds, max_bytes=1 << 20)
        s1 = cds[0]
        assert cds._bytes > 0
        s2 = cds[0]
        np.testing.assert_array_equal(s1["actions"], s2["actions"])
        cds.preload(limit=10)
        assert len(cds._cache) >= 10


class TestMisc:
    def test_portion_of_batch_ids(self):
        ids = get_portion_of_batch_ids(0.5, 10)
        assert len(ids) == 5 and ids.max() <= 9
        assert get_portion_of_batch_ids(0.0, 10).size == 0

    def test_initialize_pretrained_weights_partial(self):
        import jax.numpy as jnp
        params = {"a": {"w": jnp.zeros((2, 2)), "b": jnp.zeros(3)},
                  "c": jnp.zeros(4)}
        pre = {"a": {"w": jnp.ones((2, 2)), "b": jnp.ones(99)},  # shape mismatch on b
               "c": jnp.full(4, 7.0)}
        out = initialize_pretrained_weights(params, pre)
        np.testing.assert_allclose(np.asarray(out["a"]["w"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["a"]["b"]), 0.0)  # skipped
        np.testing.assert_allclose(np.asarray(out["c"]), 7.0)


class TestLangAnnotator:
    def test_annotate_and_write(self, tmp_path):
        # oracle: task solved in windows whose start is a multiple of 32
        def detect(start_info, end_info):
            return ["open_drawer"] if start_info["t"] % 32 == 0 else []

        infos = [{"t": t} for t in range(200)]
        ann = {"open_drawer": ["open the drawer", "pull the drawer open"]}
        idx, tasks, sents = annotate_episodes(detect, infos, ann,
                                              window=64, stride=16)
        assert len(idx) == len(tasks) == len(sents) > 0
        assert all(t == "open_drawer" for t in tasks)
        embs = np.zeros((len(sents), 1, 16), np.float32)
        p = write_auto_lang_ann(tmp_path, idx, tasks, sents, embs)
        loaded = np.load(p, allow_pickle=True).item()
        assert loaded["language"]["ann"] == sents
        assert loaded["info"]["indx"] == idx

        p2 = write_embeddings(tmp_path, {"open_drawer": ["open the drawer"]},
                              embed_fn=lambda s: np.ones(16))
        table = np.load(p2, allow_pickle=True).item()
        assert "open_drawer" in table
        np.testing.assert_allclose(table["open_drawer"]["emb"], 1.0)


def _tiny_sentence_transformer(out_dir):
    """Build a from-scratch sentence-transformers model on disk (tiny BERT +
    mean pooling) — lets the ST embedding path run without network access."""
    import transformers
    from sentence_transformers import SentenceTransformer, models

    d = out_dir / "hf"
    d.mkdir(parents=True)
    cfg = transformers.BertConfig(
        vocab_size=30, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=37,
        max_position_embeddings=64)
    transformers.BertModel(cfg).save_pretrained(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "open", "the", "drawer", "pull", "push", "slide", "block",
             "turn", "on", "off", "light", "lift", "red", "blue", "pink",
             "rotate", "place", "in", "grasp", "left", "right", "##er",
             "##s", "a", "to"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    transformers.BertTokenizer(str(d / "vocab.txt")).save_pretrained(d)
    word = models.Transformer(str(d), max_seq_length=32)
    pool = models.Pooling(32)
    st_dir = out_dir / "st"
    SentenceTransformer(modules=[word, pool]).save(str(st_dir))
    return st_dir


def test_sentence_transformer_embedder(tmp_path, monkeypatch):
    """The reference's published datasets embed annotations with
    sentence-transformers (vision_lang_calvin.yaml:34 'paraphrase-MiniLM');
    the --embedder st:<path> option reproduces that family. End-to-end:
    tiny local ST model -> annotator CLI -> auto_lang_ann.npy/embeddings.npy
    with ST-dimensional embeddings."""
    pytest.importorskip("sentence_transformers")
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("TRANSFORMERS_OFFLINE", "1")
    from mdt_policy_tpu.data.lang_annotator import main, make_embed_fn

    st_dir = _tiny_sentence_transformer(tmp_path)
    embed = make_embed_fn(f"st:{st_dir}")
    e = embed("open the drawer")
    assert e.shape == (32,) and e.dtype == np.float32
    assert np.isfinite(e).all() and e.std() > 0
    # deterministic across calls
    np.testing.assert_array_equal(e, embed("open the drawer"))
    with pytest.raises(ValueError, match="unknown embedder"):
        make_embed_fn("bogus")

    from mdt_policy_tpu.data.bench_loader import generate_dataset
    root = tmp_path / "training"
    generate_dataset(root, 120, static_hw=16, gripper_hw=16, episode_len=60)
    out = tmp_path / "lang"
    monkeypatch.setattr(
        "sys.argv",
        ["lang_annotator", "--root", str(root), "--out", str(out),
         "--embedder", f"st:{st_dir}", "--scripted-oracle", "open_drawer",
         "--window", "20", "--stride", "10", "--validation"])
    main()
    ann = np.load(out / "auto_lang_ann.npy", allow_pickle=True).item()
    assert ann["language"]["emb"].shape[1:] == (1, 32)
    assert len(ann["language"]["ann"]) == ann["language"]["emb"].shape[0] > 0
    table = np.load(out / "embeddings.npy", allow_pickle=True).item()
    assert all(v["emb"].shape == (32,) for v in table.values())


def test_scan_dataset_end_to_end(tmp_path):
    """Thread-parallel episode sweep over an on-disk split: per-frame state
    infos feed a scripted oracle; windows that complete exactly one known
    task get an annotation sentence with global frame indices."""
    from mdt_policy_tpu.data.bench_loader import generate_dataset
    from mdt_policy_tpu.data.lang_annotator import scan_dataset
    from mdt_policy_tpu.evaluation.annotations import train_annotations

    root = tmp_path / "training"
    generate_dataset(root, 120, static_hw=16, gripper_hw=16, episode_len=60)

    calls = []

    def detect(start_info, end_info):
        # state infos must carry raw robot/scene state
        assert start_info["robot_obs"].shape == (15,)
        assert end_info["scene_obs"].shape == (24,)
        calls.append(1)
        # alternate: one known task / nothing / two tasks
        n = len(calls)
        if n % 3 == 1:
            return ["open_drawer"]
        if n % 3 == 2:
            return []
        return ["open_drawer", "close_drawer"]

    indices, tasks, sentences = scan_dataset(
        root, detect, train_annotations(), window=20, stride=10, num_workers=2)
    assert len(indices) == len(tasks) == len(sentences) > 0
    assert set(tasks) == {"open_drawer"}
    table = set(train_annotations()["open_drawer"])
    assert all(s in table for s in sentences)
    # indices are global frame ids within episode bounds
    assert all(0 <= a < b < 120 for a, b in indices)
    # second episode's windows offset by its start frame
    assert any(a >= 60 for a, _ in indices)
