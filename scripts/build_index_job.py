"""spark-submit entry point: build (or resume) a persisted inverted index.

    spark-submit --py-files <zip of elasticsearch_approx_plugin_spark> \
        scripts/build_index_job.py \
        --input /path/to/corpus_parquet --output /path/to/index \
        [--text-col content --tokenizer code --n-buckets 16 --range-bits 20]
    # or --generate N to build from the deterministic synthetic corpus

Resumable: re-running with the same --output skips buckets already in
the manifest; a retried --append short-circuits inside append_to_index
(delta fingerprint in manifest.json["appends"], per-doc anti-join) —
re-running the same append job is a no-op, and a crashed append leaves
_append_pending.json which the next run refuses to proceed past.
Prints one JSON line of build metrics (files/sec, rows, postings,
bytes) — the per-partition lineage lives in <output>/manifest.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from elasticsearch_approx_plugin_spark.session import get_spark
from elasticsearch_approx_plugin_spark.functions.tokenize import tokenize_code, tokenize_ws
from elasticsearch_approx_plugin_spark.operators.postings import (
    append_to_index,
    assign_doc_ids,
    build_index,
    write_index,
)
from elasticsearch_approx_plugin_spark.sources.corpus import generate_corpus, with_sha_enforced


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet corpus path")
    ap.add_argument("--generate", type=int, help="rows of synthetic corpus instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--id-col", default=None, help="existing docID column")
    ap.add_argument("--tokenizer", choices=["code", "ws"], default="code")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--range-bits", type=int, default=20)
    ap.add_argument(
        "--no-verify-sha",
        action="store_true",
        help="skip the per-row content_sha read-path guard",
    )
    ap.add_argument(
        "--append",
        action="store_true",
        help="incrementally add these docs to the EXISTING index at "
        "--output (touched term-buckets only; results stay identical "
        "to a full rebuild)",
    )
    args = ap.parse_args()

    # resume short-circuit: a complete manifest means nothing to do —
    # report its metrics without spinning up a build
    mpath = os.path.join(args.output, "manifest.json")
    if not args.append and os.path.exists(mpath):
        with open(mpath) as f:
            man = json.load(f)
        if len(man.get("buckets", {})) == man.get("n_buckets") == args.n_buckets:
            with open(os.path.join(args.output, "meta.json")) as f:
                meta = json.load(f)
            print(
                json.dumps(
                    {
                        "resumed": True,
                        "n_docs": meta["n_docs"],
                        "avgdl": round(meta["avgdl"], 3),
                        "buckets": len(man["buckets"]),
                        "postings_rows": sum(b["rows"] for b in man["buckets"].values()),
                        "postings": sum(b["postings"] for b in man["buckets"].values()),
                        "bytes": sum(b["bytes"] for b in man["buckets"].values()),
                    }
                )
            )
            return

    spark = get_spark(app_name="build_index_job")
    t0 = time.time()
    if args.generate:
        corpus = generate_corpus(spark, args.generate)
    elif args.input:
        corpus = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --generate")

    if "content_sha" in corpus.columns and not args.no_verify_sha:
        # input_hint invariant, enforced per row ON the read path (the
        # guard fuses into the tokenize scan — zero extra passes; a
        # mismatching row fails its task with the offending repo/path)
        corpus = with_sha_enforced(corpus)

    tok = tokenize_code if args.tokenizer == "code" else tokenize_ws
    if args.id_col:
        docs = corpus.select(F.col(args.id_col).alias("doc_id"), tok(args.text_col).alias("tokens"))
    elif args.append:
        # dense ids would collide with the existing index — appends
        # without --id-col get masked-hash ids (uniform, disjoint
        # w.h.p.; use hash ids for the base build too in append flows)
        docs = corpus.select(
            F.xxhash64("repo", "path", "commit")
            .bitwiseAND(F.lit((1 << 63) - 1))
            .alias("doc_id"),
            tok(args.text_col).alias("tokens"),
        )
    else:
        docs = assign_doc_ids(corpus, ["repo", "path", "commit"]).select(
            "doc_id", tok(args.text_col).alias("tokens")
        )
    if args.append and os.path.exists(os.path.join(args.output, "meta.json")):
        meta = append_to_index(spark, args.output, docs)
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "appended": True,
                    "n_docs": meta["n_docs"],
                    "avgdl": round(meta["avgdl"], 3),
                    "wall_sec": round(wall, 2),
                }
            )
        )
        return
    # --append with no existing index bootstraps a fresh build below

    index = build_index(docs, range_bits=args.range_bits)
    manifest = write_index(index, args.output, n_buckets=args.n_buckets)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "n_docs": index.n_docs,
                "avgdl": round(index.avgdl, 3),
                "wall_sec": round(wall, 2),
                "files_per_sec": round(index.n_docs / wall, 1),
                "buckets": len(manifest["buckets"]),
                "postings_rows": sum(b["rows"] for b in manifest["buckets"].values()),
                "postings": sum(b["postings"] for b in manifest["buckets"].values()),
                "bytes": sum(b["bytes"] for b in manifest["buckets"].values()),
            }
        )
    )


if __name__ == "__main__":
    main()
