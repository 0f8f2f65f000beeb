"""Capture .explain('formatted') for every bench headline query into
plans/r18/<name>_<tag>.txt (tag = before/after).  Driver-side only: no
actions run, so this is cheap and does not disturb a concurrent suite."""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from species_range_data_pipeline_spark.plans import registry
from species_range_data_pipeline_spark.session import get_spark
import bench

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
names = sys.argv[2:] or bench.HEADLINE
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("plan-capture")
spark.sparkContext.setLogLevel("ERROR")
queries = registry.all_queries()
out = REPO / "plans" / "r18"
out.mkdir(parents=True, exist_ok=True)
for name in names:
    fn = queries.get(name)
    if fn is None:
        continue
    try:
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception as e:
        plan = f"EXPLAIN FAILED: {e}"
    (out / f"{name}_{tag}.txt").write_text(plan)
    print(name, "ok", len(plan))
spark.stop()
