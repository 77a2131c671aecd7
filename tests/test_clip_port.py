"""CLIP-tower porting parity: a randomly initialized copy of the reference's
vendored OpenAI CLIP (ViT path) must produce the same encode_image /
encode_text outputs as our flax towers after weight conversion."""

import sys
import types
from conftest import stub_module
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_clip():
    if not REF.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(REF))
    # stub deps the vendored clip.py imports but never uses for model math
    tvt = stub_module("torchvision.transforms")
    for name in ("CenterCrop", "Compose", "Normalize", "Resize", "ToTensor"):
        setattr(tvt, name, object)
    tvt.InterpolationMode = types.SimpleNamespace(BICUBIC=3)
    tv = stub_module("torchvision")
    tv.transforms = tvt
    # a real-looking __spec__: other libraries (transformers) probe
    # torchvision availability via importlib.util.find_spec, which
    # raises ValueError on a stub module whose __spec__ is None
    import importlib.machinery
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tvt.__spec__ = importlib.machinery.ModuleSpec(
        "torchvision.transforms", None)
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)
    tok_stub = stub_module("mdt.utils.clip_tokenizer")
    tok_stub.SimpleTokenizer = object
    for name in ("mdt", "mdt.utils"):
        sys.modules.setdefault(name, stub_module(name))
    sys.modules["mdt.utils.clip_tokenizer"] = tok_stub
    # load by file path (other tests register bare 'mdt' stubs that break
    # package-style imports)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_clip_mod", REF / "mdt/models/networks/clip.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.CLIP


def test_clip_tower_parity(ref_clip):
    import torch
    import jax.numpy as jnp
    from mdt_policy_tpu.models.clip import CLIPTextTower, CLIPVisionTower
    from mdt_policy_tpu.utils.torch_port import port_clip_text, port_clip_vision

    torch.manual_seed(0)
    # tiny ViT CLIP: embed 32, vision width 64/2 layers, text width 32/2 layers
    ref = ref_clip(embed_dim=32, image_resolution=32, vision_layers=2,
                   vision_width=64, vision_patch_size=16, context_length=12,
                   vocab_size=100, transformer_width=32, transformer_heads=4,
                   transformer_layers=2)
    ref = ref.float().eval()

    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((2, 12), np.int64)
    tokens[:, 0] = 5
    tokens[0, 1:4] = [7, 9, 99]   # 99 = max id -> EOT position 3
    tokens[1, 1:3] = [8, 99]

    with torch.no_grad():
        ref_img = ref.encode_image(torch.tensor(images).permute(0, 3, 1, 2)).numpy()
        ref_txt = ref.encode_text(torch.tensor(tokens)).numpy()

    # OpenAI derives vision heads as width//64 (clip.py:341-349) -> 1 here
    vis = CLIPVisionTower(embed_dim=32, image_resolution=32, layers=2,
                          width=64, patch_size=16, heads=1)
    txt = CLIPTextTower(embed_dim=32, context_length=12, vocab_size=100,
                        width=32, heads=4, layers=2)
    vparams = port_clip_vision(ref.state_dict(), layers=2)
    tparams = port_clip_text(ref.state_dict(), layers=2)

    our_img = np.asarray(vis.apply({"params": vparams}, jnp.asarray(images)))
    our_txt = np.asarray(txt.apply({"params": tparams},
                                   jnp.asarray(tokens.astype(np.int32))))
    np.testing.assert_allclose(our_img, ref_img, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(our_txt, ref_txt, rtol=1e-3, atol=1e-4)


def test_clip_resnet_tower_parity(ref_clip):
    """ModifiedResNet (RN50-family) image tower: our flax CLIPResNetTower
    must reproduce the reference's encode_image after port_clip_resnet
    (ref clip.py:93-226 AttentionPool2d + ModifiedResNet)."""
    import torch
    import jax.numpy as jnp
    from mdt_policy_tpu.models.clip import CLIPResNetTower
    from mdt_policy_tpu.utils.torch_port import port_clip_resnet

    torch.manual_seed(1)
    layers, width, res, embed = (2, 1, 1, 2), 16, 64, 32
    ref = ref_clip(embed_dim=embed, image_resolution=res,
                   vision_layers=layers, vision_width=width,
                   vision_patch_size=None, context_length=12, vocab_size=100,
                   transformer_width=64, transformer_heads=1,
                   transformer_layers=1)
    ref = ref.float().eval()
    # perturb BN running stats away from the (0, 1) init so the port of
    # running_mean/running_var is actually exercised
    with torch.no_grad():
        for m in ref.visual.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, res, res, 3)).astype(np.float32)
    with torch.no_grad():
        ref_img = ref.encode_image(
            torch.tensor(images).permute(0, 3, 1, 2)).numpy()

    tower = CLIPResNetTower(embed_dim=embed, layers=layers, width=width,
                            image_resolution=res)
    params = port_clip_resnet(ref.state_dict(), layers=layers)
    our_img = np.asarray(tower.apply({"params": params}, jnp.asarray(images)))
    np.testing.assert_allclose(our_img, ref_img, rtol=1e-3, atol=1e-4)

    # the port must land on the tower's own init tree (same paths/shapes)
    import jax
    init = tower.init(jax.random.PRNGKey(0), jnp.asarray(images))["params"]
    flat_i = jax.tree_util.tree_leaves_with_path(init)
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    assert {jax.tree_util.keystr(k) for k, _ in flat_i} \
        == {jax.tree_util.keystr(k) for k, _ in flat_p}


def test_clip_config_from_state_dict(ref_clip):
    """Checkpoint-shape-derived tower config — the reference's build_model
    derivation (clip.py:467-495) for both tower families."""
    import torch
    from mdt_policy_tpu.models.clip import clip_config_from_state_dict

    torch.manual_seed(2)
    rn = ref_clip(embed_dim=32, image_resolution=64,
                  vision_layers=(2, 1, 1, 2), vision_width=16,
                  vision_patch_size=None, context_length=12, vocab_size=100,
                  transformer_width=64, transformer_heads=1,
                  transformer_layers=2)
    cfg = clip_config_from_state_dict(
        {k: v.numpy() for k, v in rn.state_dict().items()})
    assert cfg["vision_layers"] == (2, 1, 1, 2)
    assert cfg["vision_width"] == 16
    assert cfg["vision_patch_size"] is None
    assert cfg["image_resolution"] == 64
    assert cfg["embed_dim"] == 32
    assert cfg["transformer_width"] == 64 and cfg["transformer_layers"] == 2

    vit = ref_clip(embed_dim=32, image_resolution=32, vision_layers=2,
                   vision_width=64, vision_patch_size=16, context_length=12,
                   vocab_size=100, transformer_width=32, transformer_heads=4,
                   transformer_layers=2)
    cfg = clip_config_from_state_dict(
        {k: v.numpy() for k, v in vit.state_dict().items()})
    assert cfg["vision_layers"] == 2 and cfg["vision_patch_size"] == 16
    assert cfg["image_resolution"] == 32 and cfg["vision_width"] == 64
