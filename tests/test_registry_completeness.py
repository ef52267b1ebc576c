"""Registry-completeness guard: the model and dataset registries must
cover everything the reference registers.

The existing parity tests enumerate OUR registries (so a builder we never
wrote would not fail anything); these tests enumerate the REFERENCE's
registration sites instead — by textual scan of the reference source, so
no torch import is needed — and assert each name exists here.

Reference registration sites:
- models: ``@register_model`` decorators under
  ``/root/reference/torchvision/models`` (incl. ``name=`` overrides used
  by the quantization builders, models/quantization/*.py).
- datasets: ``__all__`` of ``/root/reference/torchvision/datasets/__init__.py``.

Skipped when the reference checkout is absent (e.g. end-user installs).
"""

import ast
import pathlib
import re

import pytest

REF = pathlib.Path("/root/reference/torchvision")

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference checkout not mounted"
)


def _reference_model_names():
    names = set()
    for p in (REF / "models").rglob("*.py"):
        lines = p.read_text().splitlines()
        for i, line in enumerate(lines):
            m = re.match(
                r"\s*@register_model\((?:name\s*=\s*\"([^\"]+)\")?\)", line
            )
            if not m:
                continue
            if m.group(1):
                names.add(m.group(1))
                continue
            # walk past stacked decorators (possibly multi-line) to the def
            for j in range(i + 1, min(i + 40, len(lines))):
                d = re.match(r"\s*def\s+(\w+)", lines[j])
                if d:
                    names.add(d.group(1))
                    break
    assert len(names) > 100, f"scan looks broken: {len(names)} names"
    return names


def test_model_registry_covers_reference():
    from vision_tpu.models import list_models

    ours = set(list_models())
    missing = sorted(_reference_model_names() - ours)
    assert not missing, f"builders the reference registers but we lack: {missing}"


def _reference_dataset_all():
    tree = ast.parse((REF / "datasets" / "__init__.py").read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    return {
                        elt.value
                        for elt in node.value.elts
                        if isinstance(elt, ast.Constant)
                    }
    raise AssertionError("reference datasets/__init__.py has no __all__")


def test_dataset_exports_cover_reference():
    import vision_tpu.datasets as D

    names = _reference_dataset_all()
    assert len(names) > 50, f"scan looks broken: {len(names)} names"
    missing = sorted(n for n in names if not hasattr(D, n))
    assert not missing, f"dataset names the reference exports but we lack: {missing}"
