"""In-repo MiniLM sentence encoder: architecture parity vs torch
transformers.BertModel + sentence-transformers mean pooling, and the
annotator integration that emits MiniLM-shaped embeddings.npy
(ref mdt/utils/automatic_lang_annotator_mp.py:321-342; the published CALVIN
`lang_paraphrase-MiniLM` folders carry 384-d embeddings of this family)."""

import json
from pathlib import Path

import numpy as np
import pytest

# the MiniLM embedder's tokenizer/weight-loading path needs the `annotate`
# extra (transformers + torch); skip — not error — when absent
pytest.importorskip("transformers")
pytest.importorskip("torch")

TINY = dict(vocab_size=50, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=24,
            type_vocab_size=2)


def _tiny_torch_bert():
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=TINY["vocab_size"], hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        max_position_embeddings=TINY["max_position_embeddings"],
        type_vocab_size=TINY["type_vocab_size"], hidden_act="gelu")
    return BertModel(cfg).eval()


def test_minilm_parity_vs_torch_bert():
    """Port a random torch BertModel; masked mean pooling of its
    last_hidden_state must match MiniLMEncoder bit-near."""
    import torch
    import jax.numpy as jnp
    from mdt_policy_tpu.models.minilm import MiniLMEncoder, port_minilm_weights

    ref = _tiny_torch_bert()
    rng = np.random.default_rng(0)
    T = 12
    ids = rng.integers(0, TINY["vocab_size"], size=(3, T)).astype(np.int64)
    mask = np.ones((3, T), np.int64)
    mask[0, 8:] = 0   # ragged padding exercises the attention mask
    mask[2, 5:] = 0

    with torch.no_grad():
        out = ref(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    ref_emb = (out * m).sum(1) / m.sum(1)   # sentence-transformers Pooling(mean)

    enc = MiniLMEncoder(**TINY)
    params = port_minilm_weights(ref.state_dict())
    ours = np.asarray(enc.apply({"params": params},
                                jnp.asarray(ids.astype(np.int32)),
                                jnp.asarray(mask.astype(np.int32))))
    np.testing.assert_allclose(ours, ref_emb, rtol=1e-4, atol=1e-5)

    # prefixed key layouts land identically (round-4 ADVICE: the
    # sentence-transformers flat `0_Transformer.` layout was documented but
    # not normalized)
    import jax
    for pfx in ("bert.", "0_Transformer."):
        prefixed = {pfx + k: v for k, v in ref.state_dict().items()}
        p2 = port_minilm_weights(prefixed)
        assert jax.tree.all(jax.tree.map(np.array_equal, params, p2))


def test_minilm_l3_output_shape():
    """The production config emits the published folders' 384-d shape."""
    import jax
    import jax.numpy as jnp
    from mdt_policy_tpu.models.minilm import MINILM_L3_CONFIG, MiniLMEncoder

    cfg = dict(MINILM_L3_CONFIG)
    del cfg["layer_norm_eps"]
    enc = MiniLMEncoder(**cfg, layer_norm_eps=1e-12)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = jax.eval_shape(
        lambda k: enc.init(k, ids)["params"], jax.random.PRNGKey(0))
    out = jax.eval_shape(
        lambda p: enc.apply({"params": p}, ids), params)
    assert out.shape == (1, 384)


@pytest.fixture()
def minilm_dir(tmp_path):
    """A local sentence-transformers-layout model folder: config.json +
    pytorch_model.bin + vocab.txt — what minilm_embed_fn consumes."""
    import torch

    ref = _tiny_torch_bert()
    d = tmp_path / "tiny-minilm"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(dict(
        vocab_size=TINY["vocab_size"], hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        max_position_embeddings=TINY["max_position_embeddings"],
        type_vocab_size=TINY["type_vocab_size"])))
    torch.save(ref.state_dict(), d / "pytorch_model.bin")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "push", "the", "red", "block", "open", "drawer", "##s",
             "lift", "blue", "a", "turn", "on", "led", "slide", "left",
             "right", "pick", "up", "pink", "rotate", "toward", "place",
             "in", "grasp", "from"]
    vocab += [f"tok{i}" for i in range(TINY["vocab_size"] - len(vocab))]
    (d / "vocab.txt").write_text("\n".join(vocab))
    return d


def test_minilm_embed_fn(minilm_dir):
    from mdt_policy_tpu.models.minilm import minilm_embed_fn

    embed = minilm_embed_fn(minilm_dir)
    e1 = embed("push the red block")
    e2 = embed("open the drawers")
    assert e1.shape == (TINY["hidden_size"],) and e1.dtype == np.float32
    assert not np.allclose(e1, e2)
    # deterministic
    np.testing.assert_allclose(e1, embed("push the red block"))


@pytest.mark.slow
def test_evaluate_cli_consumes_minilm_embeddings(tmp_path):
    """Full chain: tiny train run (goal_dim matching the MiniLM hidden size)
    -> annotator writes embeddings.npy with the IN-REPO MiniLM encoder ->
    `evaluate --use-embeddings --fake-env` runs chains with the stored
    embeddings as goals (the reference's use_text_not_embedding=False path
    over a MiniLM-annotated dataset, ref evaluation/utils.py:219-240)."""
    import json as _json

    import torch
    from transformers import BertConfig, BertModel

    from mdt_policy_tpu.training import DataConfig, RunConfig, TrainerConfig, train
    from test_training_cli import TINY_OVERRIDES

    goal_dim = TINY_OVERRIDES["goal_dim"]
    # a MiniLM folder whose hidden size IS the run's goal_dim
    torch.manual_seed(3)
    cfg = BertConfig(vocab_size=50, hidden_size=goal_dim, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=24, type_vocab_size=2)
    d = tmp_path / "minilm"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(cfg.to_dict()))
    torch.save(BertModel(cfg).eval().state_dict(), d / "pytorch_model.bin")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "block"]
    vocab += [f"tok{i}" for i in range(50 - len(vocab))]
    (d / "vocab.txt").write_text("\n".join(vocab))

    run_cfg = RunConfig(
        agent="mdtv", log_dir=str(tmp_path), run_name="minilmrun",
        data=DataConfig(root_data_dir=None, synthetic_static_hw=32,
                        synthetic_gripper_hw=32),
        trainer=TrainerConfig(log_recon_images=False, batch_size=2, max_epochs=1, steps_per_epoch=1,
                              limit_val_batches=1, seed=0, log_every=1),
        agent_overrides=TINY_OVERRIDES)
    train(run_cfg)

    # annotate: validation goal table embedded by the in-repo MiniLM
    from mdt_policy_tpu.data.lang_annotator import make_embed_fn, write_embeddings
    from mdt_policy_tpu.evaluation.annotations import validation_annotations
    dataset = tmp_path / "dataset"
    write_embeddings(dataset / run_cfg.data.lang_folder,
                     validation_annotations(), make_embed_fn(f"minilm:{d}"))
    table = np.load(dataset / run_cfg.data.lang_folder / "embeddings.npy",
                    allow_pickle=True).item()
    assert next(iter(table.values()))["emb"].shape == (goal_dim,)

    from mdt_policy_tpu.evaluate import main as evaluate_main
    from mdt_policy_tpu.evaluation import get_sequences
    get_sequences.cache_clear()
    evaluate_main(["--train-folder", str(tmp_path / "minilmrun"),
                   "--fake-env", "--use-embeddings",
                   "--dataset-path", str(dataset),
                   "--num-sequences", "1", "--ep-len", "2", "--steps", "2"])
    results = _json.loads(
        (tmp_path / "minilmrun" / "evaluation" / "results.json").read_text())
    # results.json is keyed by epoch (print_and_save contract)
    assert "avg_seq_len" in next(iter(results.values()))


def test_annotator_minilm_backend(minilm_dir, tmp_path):
    """make_embed_fn('minilm:<dir>') drives write_auto_lang_ann +
    write_embeddings end-to-end: MiniLM-shaped artifacts the evaluator's
    LangEmbeddings lookup then consumes."""
    from mdt_policy_tpu.data.lang_annotator import (
        make_embed_fn, write_auto_lang_ann, write_embeddings)
    from mdt_policy_tpu.evaluation.rollout import LangEmbeddings

    embed = make_embed_fn(f"minilm:{minilm_dir}")
    sentences = ["push the red block", "open the drawers"]
    embs = np.stack([embed(s) for s in sentences])
    assert embs.shape == (2, TINY["hidden_size"])

    out = tmp_path / "lang_minilm"
    write_auto_lang_ann(out, [(0, 64), (64, 128)],
                        ["push_red", "open_drawer"], sentences, embs[:, None])
    data = np.load(out / "auto_lang_ann.npy", allow_pickle=True).item()
    assert data["language"]["emb"].shape == (2, 1, TINY["hidden_size"])

    write_embeddings(out, {"push_red": [sentences[0]],
                           "open_drawer": [sentences[1]]}, embed)
    lookup = LangEmbeddings(tmp_path, lang_folder="lang_minilm")
    goal = lookup.get_lang_goal(sentences[0])
    assert goal["lang"].shape == (TINY["hidden_size"],)
    np.testing.assert_allclose(goal["lang"], embs[0], rtol=1e-6)
