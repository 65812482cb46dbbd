"""spark-submit entry point: index maintenance — delete docs, compact.

    # tombstone ids listed one per line (Lucene live-docs semantics:
    # immediate invisibility, stats stale until compaction)
    spark-submit --py-files <zip> scripts/maintain_index_job.py \
        --index /path/to/index --delete-ids-file ids.txt

    # physical removal + exact stats recompute + manifest refresh
    spark-submit --py-files <zip> scripts/maintain_index_job.py \
        --index /path/to/index --compact

Prints one JSON status line. Combining --delete-ids-file with
--compact deletes first, then compacts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_approx_plugin_spark.session import get_spark
from elasticsearch_approx_plugin_spark.operators.postings import (
    compact_index,
    delete_from_index,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--delete-ids-file", help="text file, one docID per line")
    ap.add_argument("--compact", action="store_true")
    args = ap.parse_args()
    if not args.delete_ids_file and not args.compact:
        ap.error("nothing to do: pass --delete-ids-file and/or --compact")

    spark = get_spark(app_name="maintain_index_job")
    out: dict = {"index": args.index}
    t0 = time.time()
    if args.delete_ids_file:
        with open(args.delete_ids_file) as f:
            ids = [int(line) for line in f if line.strip()]
        out["tombstones_total"] = delete_from_index(spark, args.index, ids)
        out["deleted_now"] = len(ids)
    if args.compact:
        meta = compact_index(spark, args.index)
        out["compacted"] = True
        out["n_docs"] = meta["n_docs"]
        out["avgdl"] = round(meta["avgdl"], 3)
    out["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
