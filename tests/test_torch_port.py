"""Torch checkpoint interop (utils/torch_port.py + utils/torch_export.py).

Three layers of evidence:
- layer-level oracles: converted weights reproduce torch.nn.functional ops
  (torch is in the image; these run everywhere);
- structural: converted trees match our init trees leaf-for-leaf, so
  Trainer.warm_start_discriminator loads 100% of leaves;
- full-model oracle vs the ACTUAL reference modules (/root/reference on
  sys.path, torchvision/torchmetrics stubbed) — gated on the reference
  checkout being present.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vitgan_tpu import config as C
from vitgan_tpu.models import dcgan as DC
from vitgan_tpu.models import vitgan_v2 as V2
from vitgan_tpu.utils import torch_port as TP

REF = "/root/reference"


def _tree_shapes(tree):
    return {tuple(str(k) for k in p): v.shape for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


# ---------------------------------------------------------------------------
# layer-level oracles
# ---------------------------------------------------------------------------


def test_conv_import_matches_torch():
    g = torch.Generator().manual_seed(0)
    w = torch.randn(8, 3, 4, 4, generator=g)
    x = torch.randn(2, 3, 16, 16, generator=g)
    want = F.conv2d(x, w, stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    ours = DC.conv(TP._conv({"c.weight": w.numpy()}, "c"),
                   jnp.asarray(x.permute(0, 2, 3, 1).numpy()), 2, 1)
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-4)


def test_conv_transpose_import_matches_torch():
    g = torch.Generator().manual_seed(1)
    w = torch.randn(8, 5, 4, 4, generator=g)  # (in, out, kH, kW)
    x = torch.randn(2, 8, 8, 8, generator=g)
    want = F.conv_transpose2d(x, w, stride=2, padding=1).permute(0, 2, 3, 1).numpy()
    ours = DC.conv_transpose(TP._conv_transpose({"c.weight": w.numpy()}, "c"),
                             jnp.asarray(x.permute(0, 2, 3, 1).numpy()), 2, 1)
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-4)


def test_batch_norm_import_matches_torch_eval():
    g = torch.Generator().manual_seed(2)
    ch = 6
    weight = torch.randn(ch, generator=g)
    bias = torch.randn(ch, generator=g)
    mean = torch.randn(ch, generator=g)
    var = torch.rand(ch, generator=g) + 0.5
    x = torch.randn(2, ch, 5, 5, generator=g)
    want = F.batch_norm(x, mean, var, weight, bias, training=False,
                        eps=1e-5).permute(0, 2, 3, 1).numpy()
    p, s = TP._batch_norm({"b.weight": weight.numpy(), "b.bias": bias.numpy(),
                           "b.running_mean": mean.numpy(),
                           "b.running_var": var.numpy()}, "b")
    ours, _ = DC.batch_norm(jax.tree.map(jnp.asarray, p), jax.tree.map(jnp.asarray, s),
                            jnp.asarray(x.permute(0, 2, 3, 1).numpy()), train=False)
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-4)


def test_linear_and_qkv_import():
    g = torch.Generator().manual_seed(3)
    e, h, dh = 12, 3, 4
    sd = {}
    for nm in ("queries", "keys", "values"):
        sd[f"attention.{nm}.weight"] = torch.randn(h * dh, e, generator=g).numpy()
        sd[f"attention.{nm}.bias"] = torch.randn(h * dh, generator=g).numpy()
    qkv, qkv_b = TP._fused_qkv(sd, "attention.", h)
    assert qkv.shape == (3, h, e, dh) and qkv_b.shape == (3, h, dh)
    # per-head projection equals the torch Linear restricted to that head
    x = np.random.RandomState(0).randn(5, e).astype(np.float32)
    for j, nm in enumerate(("queries", "keys", "values")):
        full = x @ sd[f"attention.{nm}.weight"].T + sd[f"attention.{nm}.bias"]
        for head in range(h):
            got = x @ qkv[j, head] + qkv_b[j, head]
            np.testing.assert_allclose(got, full[:, head * dh:(head + 1) * dh],
                                       atol=1e-5)


# ---------------------------------------------------------------------------
# structural: converted trees are loadable leaf-for-leaf
# ---------------------------------------------------------------------------


def _synthetic_vit_sd(cfg, n_classes, prefix=""):
    r = np.random.RandomState(0)
    e, p, c = cfg.embed_dim, cfg.patch_size, cfg.channels
    hid = e * cfg.mlp_ratio
    n = (cfg.image_size // p) ** 2
    sd = {
        "embedding.conv1.weight": r.randn(e, c, p, p),
        "embedding.conv1.bias": r.randn(e),
        "embedding.pos_embedding": r.randn(1, n, e),
        "embedding.cls_token": r.randn(1, 1, e),
        "norm.weight": r.randn(e), "norm.bias": r.randn(e),
        "classifier.fc1.weight": r.randn(e, e), "classifier.fc1.bias": r.randn(e),
        "classifier.fc2.weight": r.randn(n_classes, e),
        "classifier.fc2.bias": r.randn(n_classes),
    }
    for i in range(cfg.depth):
        b = f"encoder.{i}."
        for nm in ("queries", "keys", "values"):
            sd[b + f"attention.{nm}.weight"] = r.randn(e, e)
            sd[b + f"attention.{nm}.bias"] = r.randn(e)
        sd[b + "attention.out_projection.weight"] = r.randn(e, e)
        sd[b + "attention.out_projection.bias"] = r.randn(e)
        sd[b + "norm1.weight"] = r.randn(e)
        sd[b + "norm1.bias"] = r.randn(e)
        sd[b + "norm2.weight"] = r.randn(e)
        sd[b + "norm2.bias"] = r.randn(e)
        sd[b + "fc1.weight"] = r.randn(hid, e)
        sd[b + "fc1.bias"] = r.randn(hid)
        sd[b + "fc2.weight"] = r.randn(e, hid)
        sd[b + "fc2.bias"] = r.randn(e)
    return {prefix + k: v.astype(np.float32) for k, v in sd.items()}


def test_vit_discriminator_import_structure():
    cfg = C.V2Config(image_size=16, patch_size=4, embed_dim=8, num_heads=2,
                     depth=2, mlp_ratio=2)
    sd = _synthetic_vit_sd(cfg, n_classes=1, prefix="discriminator.vit.")
    got = TP.convert_vit_discriminator(sd, cfg.num_heads)
    want = V2.discriminator_init(jax.random.PRNGKey(0), cfg)
    assert _tree_shapes(got) == _tree_shapes(want)


def test_vit_discriminator_import_slices_reference_head():
    """Reference-default checkpoints have a 10-class head
    (ref:src/v2/utils.py:28); importing as a GAN discriminator slices to
    logit 0 so the tree matches discriminator_init leaf-for-leaf."""
    cfg = C.V2Config(image_size=16, patch_size=4, embed_dim=8, num_heads=2,
                     depth=2, mlp_ratio=2)
    sd = _synthetic_vit_sd(cfg, n_classes=10, prefix="vit.")
    got = TP.convert_vit_discriminator(sd, cfg.num_heads)
    want = V2.discriminator_init(jax.random.PRNGKey(0), cfg)
    assert _tree_shapes(got) == _tree_shapes(want)
    np.testing.assert_allclose(got["params"]["head_fc2"]["w"][:, 0],
                               sd["vit.classifier.fc2.weight"][0])
    # the full head survives with slice_head=False (classifier targets)
    full = TP.convert_vit_discriminator(sd, cfg.num_heads, slice_head=False)
    assert full["params"]["head_fc2"]["w"].shape[-1] == 10


def test_cnn_and_dcgan_import_structure():
    r = np.random.RandomState(1)

    def conv_sd(i, o):
        return r.randn(o, i, 4, 4).astype(np.float32)

    def bn_sd(pfx, ch, sd):
        sd[f"{pfx}.weight"] = r.randn(ch).astype(np.float32)
        sd[f"{pfx}.bias"] = r.randn(ch).astype(np.float32)
        sd[f"{pfx}.running_mean"] = r.randn(ch).astype(np.float32)
        sd[f"{pfx}.running_var"] = (r.rand(ch) + 0.5).astype(np.float32)

    # v2 CNNGAN (ref:src/v2/modules.py:256-341)
    sd = {}
    for idx, (i, o) in {0: (3, 64), 3: (64, 128), 6: (128, 256)}.items():
        sd[f"generator.main.{idx}.weight"] = conv_sd(i, o)
    for idx, (i, o) in {9: (256, 128), 12: (128, 64), 15: (64, 3)}.items():
        sd[f"generator.main.{idx}.weight"] = r.randn(i, o, 4, 4).astype(np.float32)
    for idx, ch in {1: 64, 4: 128, 7: 256, 10: 128, 13: 64}.items():
        bn_sd(f"generator.main.{idx}", ch, sd)
    for idx, (i, o) in {0: (3, 64), 2: (64, 128), 5: (128, 256), 8: (256, 512)}.items():
        sd[f"discriminator.main.{idx}.weight"] = conv_sd(i, o)
    sd["discriminator.main.11.weight"] = r.randn(1, 512, 2, 2).astype(np.float32)
    for idx, ch in {3: 128, 6: 256, 9: 512}.items():
        bn_sd(f"discriminator.main.{idx}", ch, sd)

    ccfg = C.CNNGANConfig()
    g = TP.convert_cnn_generator(sd)
    d = TP.convert_cnn_discriminator(sd)
    assert _tree_shapes(g) == _tree_shapes(DC_init_cnn_g(ccfg))
    assert _tree_shapes(d) == _tree_shapes(DC_init_cnn_d(ccfg))

    # notebook DCGAN (ref:cnn/cnn-gan.ipynb)
    gsd = {"main.0.weight": r.randn(100, 256, 4, 4).astype(np.float32),
           "main.2.weight": r.randn(256, 128, 4, 4).astype(np.float32),
           "main.5.weight": r.randn(128, 64, 4, 4).astype(np.float32),
           "main.7.weight": r.randn(64, 3, 4, 4).astype(np.float32)}
    bn_sd("main.3", 128, gsd)
    dsd = {f"main.{i}.weight": conv_sd(*io) for i, io in
           {0: (3, 64), 3: (64, 128), 6: (128, 256)}.items()}
    dsd["main.9.weight"] = conv_sd(256, 1)
    for idx, ch in {1: 64, 4: 128, 7: 256}.items():
        bn_sd(f"main.{idx}", ch, dsd)
    dcfg = C.DCGANConfig()
    assert (_tree_shapes(TP.convert_dcgan_generator(gsd))
            == _tree_shapes(DC.generator_init(jax.random.PRNGKey(0), dcfg)))
    assert (_tree_shapes(TP.convert_dcgan_discriminator(dsd))
            == _tree_shapes(DC.discriminator_init(jax.random.PRNGKey(0), dcfg)))


def DC_init_cnn_g(cfg):
    from vitgan_tpu.models import cnngan
    return cnngan.generator_init(jax.random.PRNGKey(0), cfg)


def DC_init_cnn_d(cfg):
    from vitgan_tpu.models import cnngan
    return cnngan.discriminator_init(jax.random.PRNGKey(0), cfg)


def test_import_checkpoint_file_roundtrip(tmp_path):
    cfg = C.V2Config(image_size=16, patch_size=4, embed_dim=8, num_heads=2,
                     depth=1, mlp_ratio=2)
    sd = _synthetic_vit_sd(cfg, n_classes=1, prefix="vit.")
    path = tmp_path / "best_model_epoch_3_fid_42.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))
    got = TP.import_checkpoint(str(path), "v2", num_heads=cfg.num_heads)
    want = TP.convert_vit_discriminator(sd, cfg.num_heads)
    for (pa, a), (pb, b) in zip(
            sorted(_tree_shapes(got).items()), sorted(_tree_shapes(want).items())):
        assert pa == pb and a == b
    # v1-style {"state_dict": ...} wrapper (ref:src/v1/gan.py:179-191)
    w = tmp_path / "ckpt_epoch5.ckpt"
    torch.save({"lr": 1e-4, "epoch": 5,
                "state_dict": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(w))
    assert TP.load_torch_state_dict(str(w)).keys() == sd.keys()
    with pytest.raises(ValueError):
        TP.import_checkpoint(str(path), "v2", role="generator")


def test_warm_start_from_torch_import():
    """End-to-end: imported ViT D warm-starts the trainer state 100%."""
    from vitgan_tpu.utils.checkpoint import partial_load

    cfg = C.V2Config(image_size=16, patch_size=4, embed_dim=8, num_heads=2,
                     depth=2, mlp_ratio=2)
    sd = _synthetic_vit_sd(cfg, n_classes=1)
    imported = TP.convert_vit_discriminator(sd, cfg.num_heads)
    target = DC_init_v2_d(cfg)
    merged, loaded, total = partial_load(target, imported)
    assert loaded == total  # every leaf matched path+shape
    # and a converted value actually landed
    np.testing.assert_allclose(
        np.asarray(merged["params"]["pos"]), sd["embedding.pos_embedding"][0])


def DC_init_v2_d(cfg):
    return V2.discriminator_init(jax.random.PRNGKey(1), cfg)


def _dcgan_g_sd(seed: int):
    """Reference-format DCGAN generator state_dict (cnn/cnn-gan.ipynb G) at
    full notebook widths."""
    r = np.random.RandomState(seed)
    return {"main.0.weight": r.randn(100, 256, 4, 4).astype(np.float32),
            "main.2.weight": r.randn(256, 128, 4, 4).astype(np.float32),
            "main.5.weight": r.randn(128, 64, 4, 4).astype(np.float32),
            "main.7.weight": r.randn(64, 3, 4, 4).astype(np.float32),
            "main.3.weight": r.randn(128).astype(np.float32),
            "main.3.bias": r.randn(128).astype(np.float32),
            "main.3.running_mean": r.randn(128).astype(np.float32),
            "main.3.running_var": (r.rand(128) + 0.5).astype(np.float32)}


def _save_sd(path, sd):
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd.items()}, str(path))


def test_cli_warm_start_from_torch_file(tmp_path):
    """cli train --warm-start-d with a reference-format .pth end to end."""
    from vitgan_tpu.cli import _warm_start_d
    from vitgan_tpu.train.trainer import Trainer

    cfg = C.replace(C.smoke_config("v2"), run_name="tp")
    trainer = Trainer(cfg, run_base=str(tmp_path), fid_extractor="random_conv")
    vcfg = cfg.model
    sd = _synthetic_vit_sd(vcfg, n_classes=1, prefix="discriminator.vit.")
    path = tmp_path / "ref_best.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))
    loaded = _warm_start_d(trainer, str(path), cfg)
    n_leaves = len(jax.tree.leaves(trainer.state.d_params))
    assert loaded == n_leaves
    np.testing.assert_allclose(
        np.asarray(trainer.state.d_params["pos"]),
        sd["discriminator.vit.embedding.pos_embedding"][0], atol=1e-6)


def _assert_trees_equal(a, b, atol=0.0):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert [p for p, _ in fa] == [p for p, _ in fb]
    for (_, va), (_, vb) in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=atol)


def test_export_import_roundtrip_exact():
    """utils/torch_export is the exact inverse of utils/torch_port for every
    covered family — bit-exact round trips."""
    from vitgan_tpu.models import cnngan
    from vitgan_tpu.utils import torch_export as TE

    cfg = C.V2Config(image_size=16, patch_size=4, embed_dim=8, num_heads=2,
                     depth=2, mlp_ratio=2)
    d = V2.discriminator_init(jax.random.PRNGKey(3), cfg)
    back = TP.convert_vit_discriminator(
        TE.export_checkpoint(d, "v2", channels=cfg.channels), cfg.num_heads)
    _assert_trees_equal(back, jax.device_get(d))

    ccfg = C.CNNGANConfig()
    g = cnngan.generator_init(jax.random.PRNGKey(4), ccfg)
    dd = cnngan.discriminator_init(jax.random.PRNGKey(5), ccfg)
    _assert_trees_equal(TP.convert_cnn_generator(TE.export_cnn_generator(g)),
                        jax.device_get(g))
    _assert_trees_equal(
        TP.convert_cnn_discriminator(TE.export_cnn_discriminator(dd)),
        jax.device_get(dd))

    dcfg = C.DCGANConfig()
    g2 = DC.generator_init(jax.random.PRNGKey(6), dcfg)
    d2 = DC.discriminator_init(jax.random.PRNGKey(7), dcfg)
    _assert_trees_equal(TP.convert_dcgan_generator(TE.export_dcgan_generator(g2)),
                        jax.device_get(g2))
    _assert_trees_equal(
        TP.convert_dcgan_discriminator(TE.export_dcgan_discriminator(d2)),
        jax.device_get(d2))

    with pytest.raises(ValueError):
        TE.export_checkpoint(d, "v2", role="generator")
    with pytest.raises(ValueError):
        TE.export_checkpoint(d, "v1")


def test_cli_generate_from_torch(tmp_path, monkeypatch):
    """cli generate --from-torch samples from an imported DCGAN generator."""
    from vitgan_tpu.cli import main

    gsd = _dcgan_g_sd(3)
    path = tmp_path / "netG_epoch_14.pth"
    _save_sd(path, gsd)
    monkeypatch.setenv("SCRATCH", str(tmp_path))
    monkeypatch.setenv("DEV", "1")
    rc = main(["generate", "--family", "dcgan", "--num-images", "2",
               "--from-torch", str(path), "--set", "dcgan.base_width=64",
               "--set", "dcgan.batch_size=2"])
    assert rc == 0
    assert (tmp_path / "vitgan_tpu_samples" / "generated_images.png").exists()


def test_cli_import_torch_materializes_run(tmp_path, monkeypatch):
    """cli import-torch creates a run dir that generate restores from; roles
    the state_dict doesn't carry are auto-skipped."""
    from vitgan_tpu.cli import main

    gsd = _dcgan_g_sd(8)
    path = tmp_path / "netG.pth"
    _save_sd(path, gsd)
    monkeypatch.setenv("SCRATCH", str(tmp_path))
    monkeypatch.setenv("DEV", "1")
    rc = main(["import-torch", str(path), "--family", "dcgan",
               "--run-name", "imp", "--set", "dcgan.base_width=64",
               "--set", "dcgan.batch_size=2"])
    assert rc == 0
    assert (tmp_path / "output" / "imp" / "config.json").exists()
    rc = main(["generate", "--run-dir", str(tmp_path / "output" / "imp"),
               "--num-images", "2"])
    assert rc == 0
    assert (tmp_path / "output" / "imp" / "test" / "generated_images.png").exists()
    # explicit role that doesn't fit must fail loud
    with pytest.raises(ValueError):
        main(["import-torch", str(path), "--family", "dcgan",
              "--run-name", "imp2", "--roles", "discriminator",
              "--set", "dcgan.base_width=64"])
    # role typos fail with the actual problem named, not a shape mismatch
    with pytest.raises(ValueError, match="unknown role"):
        main(["import-torch", str(path), "--family", "dcgan",
              "--run-name", "imp3", "--roles", "Generator"])


def test_serve_loads_imported_run(tmp_path, monkeypatch):
    """An import-torch run dir drops into the serving restore path
    (serve.load_service) like any trained run."""
    from vitgan_tpu.cli import main
    from vitgan_tpu.serve import load_service

    gsd = _dcgan_g_sd(9)
    path = tmp_path / "netG.pth"
    _save_sd(path, gsd)
    monkeypatch.setenv("SCRATCH", str(tmp_path))
    monkeypatch.setenv("DEV", "1")
    assert main(["import-torch", str(path), "--family", "dcgan",
                 "--run-name", "srv", "--set", "dcgan.base_width=64",
                 "--set", "dcgan.batch_size=2"]) == 0
    svc = load_service(str(tmp_path / "output" / "srv"), batch=2)
    imgs = svc.sample(2, seed=0)
    assert imgs.shape == (2, 32, 32, 3) and np.isfinite(np.asarray(imgs)).all()


@pytest.mark.slow
def test_finetune_from_imported_run(tmp_path, monkeypatch):
    """train --resume on an import-torch run dir fine-tunes the imported
    weights (restores step 0, then trains)."""
    from vitgan_tpu.cli import main

    gsd = _dcgan_g_sd(10)
    path = tmp_path / "netG.pth"
    _save_sd(path, gsd)
    monkeypatch.setenv("SCRATCH", str(tmp_path))
    monkeypatch.setenv("DEV", "1")
    sets = ["--set", "dcgan.base_width=64", "--set", "dcgan.batch_size=8"]
    assert main(["import-torch", str(path), "--family", "dcgan",
                 "--run-name", "ft"] + sets) == 0
    rc = main(["train", "--family", "dcgan", "--dataset", "synthetic",
               "--epochs", "1", "--run-name", "ft", "--resume"] + sets)
    assert rc == 0
    # a later checkpoint than the imported step-0 one exists
    ckpts = sorted(os.listdir(tmp_path / "output" / "ft" / "checkpoints"))
    assert any(c.startswith("step_") and not c.endswith("0" * 10)
               and not c.endswith(".json") for c in ckpts)


@pytest.mark.slow
def test_cli_export_torch_roundtrip(tmp_path, monkeypatch):
    """cli export-torch writes a .pth that import_checkpoint reads back with
    the exact same values the run dir holds."""
    from vitgan_tpu.cli import main

    monkeypatch.setenv("SCRATCH", str(tmp_path))
    monkeypatch.setenv("DEV", "1")
    assert main(["train", "--family", "dcgan", "--dataset", "synthetic",
                 "--epochs", "1", "--run-name", "exp"]) == 0
    run_dir = str(tmp_path / "output" / "exp")
    assert main(["export-torch", "--run-dir", run_dir, "--role", "generator"]) == 0
    out = os.path.join(run_dir, "dcgan_generator.pth")
    imported = TP.import_checkpoint(out, "dcgan", role="generator")
    from vitgan_tpu.utils.run_dirs import restore_run

    _, _, state, _ = restore_run(run_dir)
    want = jax.device_get(state.g_vars_ema)
    got_leaves = jax.tree_util.tree_flatten_with_path(imported)[0]
    want_leaves = {tuple(str(k) for k in p): v for p, v in
                   jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_leaves
    for p, v in got_leaves:
        np.testing.assert_allclose(np.asarray(v),
                                   np.asarray(want_leaves[tuple(str(k) for k in p)]),
                                   atol=1e-6)


def test_cli_import_torch_reference_default_v2(tmp_path, monkeypatch):
    """The README flagship flow: a reference-default (10-class-head) v2
    ViTGAN checkpoint imports into a run dir without shape errors."""
    from vitgan_tpu.cli import main

    cfg = C.replace(C.smoke_config("v2"), run_name="x").model
    sd = _synthetic_vit_sd(cfg, n_classes=10, prefix="discriminator.vit.")
    path = tmp_path / "best_model_epoch_9_fid_88.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))
    monkeypatch.setenv("SCRATCH", str(tmp_path))
    monkeypatch.setenv("DEV", "1")
    rc = main(["import-torch", str(path), "--family", "v2",
               "--run-name", "impv2"])
    assert rc == 0
    assert (tmp_path / "output" / "impv2" / "config.json").exists()


# ---------------------------------------------------------------------------
# full-model oracle against the actual reference modules
# ---------------------------------------------------------------------------


def _reference_modules():
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    # torchvision / torchmetrics are not in this image: stub exactly the names
    # src.v2.{modules,utils} import (only exercised by code paths we don't run)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        models.vit_b_16 = None
        models.ViT_B_16_Weights = types.SimpleNamespace(DEFAULT=None)
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        for sub in ("datasets", "transforms"):
            m = types.ModuleType(f"torchvision.{sub}")
            sys.modules[f"torchvision.{sub}"] = m
            setattr(tv, sub, m)
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        im = types.ModuleType("torchmetrics.image")
        fid = types.ModuleType("torchmetrics.image.fid")
        fid.FrechetInceptionDistance = type("FID", (), {})
        im.fid = fid
        tm.image = im
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.image"] = im
        sys.modules["torchmetrics.image.fid"] = fid
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        import importlib
        return importlib.import_module("src.v2.modules")
    except Exception as e:  # missing transitive dep on a stripped machine
        pytest.skip(f"reference modules not importable: {e}")


def test_vit_import_matches_reference_forward():
    M = _reference_modules()
    cfg = C.V2Config(image_size=16, patch_size=4, embed_dim=16, num_heads=2,
                     depth=2, mlp_ratio=2, dropout=0.0)
    torch.manual_seed(0)
    vit = M.VisionTransformer(n_channels=3, embed_dim=cfg.embed_dim, n_layers=cfg.depth,
                              n_attention_heads=cfg.num_heads, forward_mul=cfg.mlp_ratio,
                              image_size=cfg.image_size, patch_size=cfg.patch_size,
                              n_classes=5, dropout=0.0).eval()
    x = torch.randn(3, 3, cfg.image_size, cfg.image_size)
    with torch.no_grad():
        want = vit(x).numpy()
    params = TP.convert_vit(TP.to_numpy_state_dict(vit.state_dict()), cfg.num_heads)
    got = V2.vit_apply(jax.tree.map(jnp.asarray, params),
                       jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_reference_v1_discriminator_is_unconstructable():
    """Documents why there is no v1 torch importer: the reference v1 D crashes
    at construction (undefined projection_output_size,
    ref:src/v1/patch_encoder.py:29-34, SURVEY §2.4.1), so no trained v1
    checkpoint can exist to import."""
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    os.environ.setdefault("SCRATCH", "/tmp/refscratch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        import importlib
        mod = importlib.import_module("src.v1.discriminatorViT")
    except Exception as e:
        pytest.skip(f"reference v1 modules not importable: {e}")
    with pytest.raises(AttributeError, match="projection_output_size"):
        mod.Discriminator()


def test_export_loads_into_reference_strict():
    """An exported state_dict loads into the ACTUAL reference modules with
    strict=True, and the reference forward equals ours on the same weights —
    the bidirectional parity proof."""
    M = _reference_modules()
    cfg = C.V2Config(image_size=16, patch_size=4, embed_dim=16, num_heads=2,
                     depth=2, mlp_ratio=2, dropout=0.0)
    from vitgan_tpu.utils import torch_export as TE

    params = V2.vit_init(jax.random.PRNGKey(11), cfg, n_classes=5)
    sd = TE.export_vit(jax.device_get(params), channels=cfg.channels)
    vit = M.VisionTransformer(n_channels=3, embed_dim=cfg.embed_dim,
                              n_layers=cfg.depth, n_attention_heads=cfg.num_heads,
                              forward_mul=cfg.mlp_ratio, image_size=cfg.image_size,
                              patch_size=cfg.patch_size, n_classes=5,
                              dropout=0.0).eval()
    vit.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    x = torch.randn(3, 3, cfg.image_size, cfg.image_size,
                    generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = vit(x).numpy()
    got = V2.vit_apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_cnngan_import_matches_reference_forward():
    M = _reference_modules()
    rcfg = __import__("importlib").import_module("src.v2.utils").Config(
        image_size=32, input_channels=3)
    torch.manual_seed(1)
    gan = M.CNNGAN(rcfg).eval()
    ccfg = C.CNNGANConfig(image_size=32, channels=3)
    z = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        img_t = gan.generator(z).numpy()
        d_t = gan.discriminator(torch.from_numpy(img_t)).numpy()
    sd = TP.to_numpy_state_dict(gan.state_dict())
    gv = jax.tree.map(jnp.asarray, TP.convert_cnn_generator(sd))
    dv = jax.tree.map(jnp.asarray, TP.convert_cnn_discriminator(sd))
    from vitgan_tpu.models import cnngan
    img_j, _ = cnngan.generator_apply(gv, jnp.asarray(z.permute(0, 2, 3, 1).numpy()
                                                      .reshape(2, -1)), ccfg)
    np.testing.assert_allclose(np.asarray(img_j),
                               img_t.transpose(0, 2, 3, 1), atol=3e-4)
    logit_j, _ = cnngan.discriminator_apply(
        dv, jnp.asarray(img_t.transpose(0, 2, 3, 1)), ccfg)
    # reference emits sigmoid(prob); we emit the logit
    np.testing.assert_allclose(1.0 / (1.0 + np.exp(-np.asarray(logit_j))),
                               d_t, atol=3e-4)
