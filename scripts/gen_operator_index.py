"""Generate OPERATORS.md: every public function in the engine with
its signature and first docstring line — the one-page API inventory.

Regenerate after adding operators:  python scripts/gen_operator_index.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")

MODULES = [
    "v6spark.genomics",
    "v6spark.compute",
    "v6spark.pipeline",
    "v6spark.operators.stats",
    "v6spark.operators.filters",
    "v6spark.operators.transforms",
    "v6spark.operators.asof",
    "v6spark.operators.sessionize",
    "v6spark.operators.dedup",
    "v6spark.operators.spandedup",
    "v6spark.operators.sketches",
    "v6spark.operators.similarity",
    "v6spark.operators.text",
    "v6spark.operators.contamination",
    "v6spark.operators.sampling",
    "v6spark.operators.packing",
    "v6spark.operators.profile",
    "v6spark.operators.embeddings",
    "v6spark.operators.skew",
    "v6spark.operators.bpe",
    "v6spark.operators.html",
    "v6spark.operators.graph",
    "v6spark.operators.multimodal",
    "v6spark.operators.media_fingerprint",
    "v6spark.operators.media_metadata",
    "v6spark.operators.media_containers",
    "v6spark.operators.avi",
    "v6spark.operators.jpeg",
    "v6spark.operators.gif",
    "v6spark.sources.tables",
    "v6spark.sources.schemas",
    "v6spark.sources.vcf",
    "v6spark.sources.vcf_datasource",
    "v6spark.sources.media_datasource",
    "v6spark.sources.zarr_store",
    "v6spark.sources.layout",
    "v6spark.sources.rollup",
    "v6spark.sources.trainshards",
    "v6spark.sources.ivf_index",
    "v6spark.sources.sketch_store",
    "v6spark.sources.publog",
    "v6spark.streaming.events",
    "v6spark.streaming.sources",
    "v6spark.streaming.stateful",
    "v6spark.streaming.neardedup",
    "v6spark.streaming.mediadedup",
    "v6spark.streaming.cdcagg",
    "v6spark.streaming.replication",
    "v6spark.txlog",
    "v6spark.operators.xxh64",
    "v6spark.sources.pubcorpus",
    "v6spark.sources.pubcorpus_writer",
    "v6spark.sources.pubcdc",
    "v6spark.sources.ivfindex_source",
    "v6spark.operators.codec_adapter",
    "v6spark.functions.determinism",
    "v6spark.functions.arrays",
]


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    line = doc.strip().splitlines()[0].strip()
    return line


def main() -> None:
    lines = [
        "# Operator index",
        "",
        "Auto-generated (`python scripts/gen_operator_index.py`) — every",
        "public function with its signature's first line.  SURVEY.md §2",
        "holds the narrative inventory; this is the lookup table.",
        "",
    ]
    n_fns = 0
    for name in MODULES:
        mod = importlib.import_module(name)
        fns = []
        for fname, fn in sorted(vars(mod).items()):
            if fname.startswith("_") or not inspect.isfunction(fn):
                continue
            if fn.__module__ != name:
                continue  # re-exports belong to their home module
            try:
                sig = str(inspect.signature(fn))
            except (TypeError, ValueError):
                sig = "(...)"
            if len(sig) > 80:
                sig = sig[:77] + "...)"
            fns.append((fname, sig, first_line(fn.__doc__)))
        if not fns:
            continue
        lines.append(f"## {name}")
        mod_doc = first_line(mod.__doc__)
        if mod_doc:
            lines.append(f"*{mod_doc}*")
        lines.append("")
        for fname, sig, doc in fns:
            lines.append(f"- **`{fname}{sig}`** — {doc}")
            n_fns += 1
        lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {n_fns} public functions across {len(MODULES)} modules")


if __name__ == "__main__":
    main()
