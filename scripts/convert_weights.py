#!/usr/bin/env python
"""Convert a torch checkpoint (.pth) to flax variables (.msgpack).

Offline analog of the builders' own weight-loading path
(``models/_api.py`` ``get_state_dict`` -> ``_torch_convert``): point it at a
locally-saved reference checkpoint and it writes a flax msgpack that
``--from-msgpack`` in scripts/eval_imagenet.py (or
``vision_tpu.models._hub.load_variables_msgpack``) loads back.

One-command path on a NETWORKED machine (no this script needed):

    from vision_tpu.models import resnet50, ResNet50_Weights
    model = resnet50(weights=ResNet50_Weights.IMAGENET1K_V2)

Offline path (this script):

    python scripts/convert_weights.py --model resnet50 \
        --checkpoint resnet50-11ad3fa6.pth --out resnet50_v2.msgpack
    python scripts/eval_imagenet.py --model resnet50 \
        --from-msgpack resnet50_v2.msgpack --data /data/imagenet/val

Checksums: the expected reference URLs (whose basename embeds the torch hub
sha prefix) are listed per model via --list-urls.
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=False, help="builder name, e.g. resnet50")
    p.add_argument("--checkpoint", help="local torch .pth file")
    p.add_argument("--out", help="output .msgpack path")
    p.add_argument(
        "--weights", default="DEFAULT",
        help="weights enum member the checkpoint corresponds to",
    )
    p.add_argument(
        "--list-urls", action="store_true",
        help="print every model's expected checkpoint URL (sha in basename)",
    )
    args = p.parse_args()

    from vision_tpu.models import (
        get_model, get_model_weights, list_models,
    )

    if args.list_urls:
        for name in list_models():
            try:
                enum = get_model_weights(name)
            except ValueError:
                continue
            for member in enum:
                print(f"{name}\t{enum.__name__}.{member.name}\t{member.url}")
        return 0

    if not (args.model and args.checkpoint and args.out):
        p.error("--model, --checkpoint and --out are required")

    import numpy as np
    import torch

    from vision_tpu._torch_convert import convert_torch_state_dict
    from vision_tpu.models._convert_registry import get_conversion_hooks
    from vision_tpu.models._hub import save_variables_msgpack

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    import jax

    model = get_model(args.model)
    hooks = get_conversion_hooks(args.model)
    variables = convert_torch_state_dict(sd, model.variables, hooks=hooks)
    save_variables_msgpack(variables, args.out)
    n = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables)
    )
    print(f"wrote {args.out}: {args.model}, {n} converted values")
    return 0


if __name__ == "__main__":
    sys.exit(main())
