"""Weight-conversion + eval harness round trip (VERDICT.md item 6):
torch .pth -> scripts/convert_weights.py -> msgpack -> forward parity, and
scripts/eval_imagenet.py end-to-end on a synthetic ImageFolder tree."""

import pathlib
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run(args, **kw):
    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, env=env,
        cwd=REPO, **kw,
    )


@pytest.mark.slow
def test_convert_weights_roundtrip(tmp_path):
    """torch.save a live torch resnet18 -> convert CLI -> msgpack ->
    load -> logits match the torch model."""
    from tests.torch_refs import randomize_bn_stats, torch_resnet18
    from vision_tpu.models import resnet18
    from vision_tpu.models._hub import load_variables_msgpack

    tm = randomize_bn_stats(torch_resnet18(num_classes=1000))
    tm.eval()
    ckpt = tmp_path / "resnet18.pth"
    torch.save(tm.state_dict(), ckpt)
    out = tmp_path / "resnet18.msgpack"

    proc = _run(
        [
            "scripts/convert_weights.py", "--model", "resnet18",
            "--checkpoint", str(ckpt), "--out", str(out),
        ]
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists()

    fm = resnet18()
    variables = load_variables_msgpack(str(out), fm.variables)
    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(fm.module.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_convert_weights_list_urls():
    proc = _run(["scripts/convert_weights.py", "--list-urls"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = proc.stdout.strip().splitlines()
    assert any(l.startswith("resnet50\t") for l in lines)
    assert all("https://" in l for l in lines[:5])


def test_eval_imagenet_on_synthetic_folder(tmp_path):
    """eval CLI end to end: 2-class synthetic val tree, random weights —
    checks the plumbing (decode -> preset -> forward -> top-k), not acc."""
    from PIL import Image

    rng = np.random.RandomState(0)
    for cls in ("n01440764", "n01443537"):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
            ).save(d / f"img_{i}.JPEG")

    proc = _run(
        [
            "scripts/eval_imagenet.py", "--model", "resnet18",
            "--data", str(tmp_path / "val"), "--batch-size", "4",
        ],
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "acc@1=" in proc.stdout


@pytest.mark.slow
def test_accuracy_gate_end_to_end_both_ways(tmp_path):
    """VERDICT r4 item 7: the full offline download->convert->eval->gate
    chain, executable end to end. A live torch resnet18 checkpoint is
    converted via the CLI, evaluated on a synthetic ImageFolder val tree
    through --from-msgpack, and the --gate logic is exercised BOTH ways:
    exit 0 when measured acc@1 matches the expected value within 0.05,
    exit 1 when it does not. (On a networked machine the same chain is
    one command: scripts/eval_imagenet.py --model resnet50
    --weights IMAGENET1K_V2 --data <val> --gate.)"""
    import re

    from tests.torch_refs import randomize_bn_stats, torch_resnet18

    tm = randomize_bn_stats(torch_resnet18(num_classes=1000))
    tm.eval()
    ckpt = tmp_path / "resnet18.pth"
    torch.save(tm.state_dict(), ckpt)
    out = tmp_path / "resnet18.msgpack"
    proc = _run(
        [
            "scripts/convert_weights.py", "--model", "resnet18",
            "--checkpoint", str(ckpt), "--out", str(out),
        ]
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    from PIL import Image

    rng = np.random.RandomState(1)
    for cls in ("n01440764", "n01443537"):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
            ).save(d / f"img_{i}.JPEG")

    base = [
        "scripts/eval_imagenet.py", "--model", "resnet18",
        "--from-msgpack", str(out), "--data", str(tmp_path / "val"),
        "--batch-size", "4",
    ]
    # measure once (no gate), then gate against the measured value (pass)
    # and against measured+1.0 (fail)
    proc = _run(base, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = re.search(r"acc@1=([0-9.]+)", proc.stdout.splitlines()[-1])
    assert m, proc.stdout
    measured = float(m.group(1))

    ok = _run(
        base + ["--gate", "--published", str(measured)], timeout=900
    )
    assert ok.returncode == 0, (ok.stdout, ok.stderr[-2000:])
    assert "gate:" in ok.stdout

    bad = _run(
        base + ["--gate", "--published", str(measured + 1.0)], timeout=900
    )
    assert bad.returncode == 1, (bad.stdout, bad.stderr[-2000:])
