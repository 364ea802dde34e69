"""Generate docs/passes.md — the render-pass reference — from the live
registry (pass type, docstring summary, config schema with defaults and
choices, I/O channels). The reference documents passes through renderUI
tooltips and per-pass READMEs; headless, the registry IS the source of
truth, so the docs are generated from it and committed.

Usage: python tools/gen_pass_docs.py [--out docs/passes.md]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "passes.md"))
    args = ap.parse_args(argv)

    import rtsdm_tpu.passes  # noqa: F401  (registers everything)
    from rtsdm_tpu.rendergraph.render_pass import (PASS_REGISTRY,
                                                   RenderContext)

    ctx = RenderContext(width=64, height=64)
    lines = ["# Render-pass reference",
             "",
             "Auto-generated from the pass registry by "
             "`tools/gen_pass_docs.py` — do not edit by hand.",
             "", f"{len(PASS_REGISTRY)} registered passes.", ""]
    for name in sorted(PASS_REGISTRY):
        cls = PASS_REGISTRY[name]
        doc = (cls.__doc__ or "").strip().split("\n\n")[0].replace("\n", " ")
        lines += [f"## {name}", "", doc or "*(no docstring)*", ""]
        try:
            p = cls({})
            refl = p.reflect(ctx)
            ins = ", ".join(f"`{c.name}`" + ("?" if c.optional else "")
                            for c in refl.inputs) or "—"
            outs = ", ".join(f"`{c.name}`" for c in refl.outputs) or "—"
            lines += [f"**in:** {ins}  ", f"**out:** {outs}", ""]
        except Exception as e:  # reflection needing scene/ctx specifics
            lines += [f"*(reflection unavailable: {type(e).__name__})*", ""]
        if cls.SCHEMA:
            lines += ["| key | default | choices/range |", "|---|---|---|"]
            for k, v in cls.SCHEMA.items():
                extra = ""
                if k in getattr(cls, "UI_CHOICES", {}):
                    extra = ", ".join(map(str, cls.UI_CHOICES[k]))
                elif k in getattr(cls, "UI_RANGES", {}):
                    lo, hi = cls.UI_RANGES[k]
                    extra = f"[{lo}, {hi}]"
                lines.append(f"| `{k}` | `{v!r}` | {extra} |")
            lines.append("")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({len(PASS_REGISTRY)} passes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
