"""Phase profiler for qz11_embedding_neardup_lsh — where does the sf1
wall go?  Times (a) candidate generation alone, (b) the full operator,
so the re-rank cost is the difference.  Run:

    python scripts/profile_neardup_lsh.py /root/testdata/sf1.0
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frizzle_spark.session import get_spark
from frizzle_spark.operators import similarity as S

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark()

t0 = time.time()
n_cand = S.embedding_lsh_candidates(spark, sf_dir).count()
t1 = time.time()
n_out = S.qz11_embedding_neardup_lsh(spark, sf_dir).count()
t2 = time.time()
print(
    {
        "sf_dir": sf_dir,
        "candidates": n_cand,
        "cand_s": round(t1 - t0, 2),
        "out_rows": n_out,
        "full_s": round(t2 - t1, 2),
        "rerank_s_approx": round((t2 - t1) - (t1 - t0), 2),
    }
)
