"""Convert released reference checkpoints (.pth) into our orbax layout.

    python scripts/import_reference_ckpt.py best.pth out_dir \
        [--kind full|mvit|vggish]

kind=full: a DiffSal best.pth (module.-prefixed VideoSaliencyModel).
kind=mvit: a Kinetics MViT checkpoint ('backbone.'-prefixed).
kind=vggish: vggish.pth.

The converted variables are saved with orbax and can be merged into a
Trainer via `warm_start` (strict=0 semantics, reference model.py:17-22).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--kind", default="full",
                    choices=["full", "mvit", "vggish"])
    args = ap.parse_args()

    from diff_sal_tpu.train import convert as cv
    from diff_sal_tpu.train.checkpoint import CheckpointManager

    sd = cv.load_torch_state_dict(args.ckpt)
    if args.kind == "full":
        variables = cv.convert_video_saliency_model(sd)
    elif args.kind == "mvit":
        stripped = {
            k[len("backbone."):]: v
            for k, v in sd.items()
            if k.startswith("backbone.")
        } or sd
        variables = cv.convert_mvit(stripped)
    else:
        variables = cv.convert_vggish(sd)

    mgr = CheckpointManager(args.out_dir)
    mgr.save(0, variables)
    n = sum(1 for _ in _leaves(variables))
    print(f"converted {n} arrays -> {args.out_dir}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
