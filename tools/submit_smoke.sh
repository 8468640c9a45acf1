#!/usr/bin/env bash
# North-rule launch-mode smoke: package the library, spark-submit the index
# build on a REAL multi-executor cluster (local-cluster: separate executor
# JVMs) with --py-files, resumable chunked path, then run the query job.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/se_spark.zip
rm -f "$ZIP"; zip -qr "$ZIP" search_engine_spark

OPENS=$(python - <<'EOF'
mods = ["java.lang","java.lang.invoke","java.lang.reflect","java.io",
        "java.net","java.nio","java.util","java.util.concurrent",
        "java.util.concurrent.atomic","jdk.internal.ref","sun.nio.ch",
        "sun.nio.cs","sun.security.action","sun.util.calendar"]
print(" ".join(f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in mods)
      + " -Dio.netty.tryReflectionSetAccessible=true")
EOF
)

PAGES=${1:-/tmp/se_submit_pages}
IDX=${2:-/tmp/se_submit_idx}
if [ ! -d "$PAGES" ]; then
  python - <<EOF
from search_engine_spark.session import get_spark
from search_engine_spark.corpus import gen_pages_df
gen_pages_df(get_spark(cores=8), 3000, partitions=8).write.parquet("$PAGES")
EOF
fi

rm -rf "$IDX"
/opt/spark/bin/spark-submit \
  --master "local-cluster[2,2,4096]" \
  --conf spark.executor.memory=4096m \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.enabled=false \
  --conf spark.executorEnv.PYTHONPATH="$PWD" \
  --conf "spark.executor.extraJavaOptions=$OPENS" \
  --py-files "$ZIP" \
  jobs/build_index_job.py --input "$PAGES" --output "$IDX" --chunks 3

/opt/spark/bin/spark-submit \
  --master "local[4]" \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  jobs/query_job.py --index "$IDX" --queries "prince andrew" "historic event" -k 5
