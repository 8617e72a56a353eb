#!/bin/sh
# Build the graft ACL Catalyst extension jar against the installed pyspark
# jars. Output: delta_lake_proxy_spark/ext/graft-acl-ext.jar (committed, so
# runtime environments without javac can still use the extension).
set -e
cd "$(dirname "$0")/.."
SPARK_JARS=$(python - <<'EOF'
import os, pyspark
print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
EOF
)
SRC=delta_lake_proxy_spark/ext/java
OUT=/tmp/graft_ext_classes
rm -rf "$OUT" && mkdir -p "$OUT"
javac -classpath "$SPARK_JARS/*" -d "$OUT" "$SRC"/graft/*.java
jar cf delta_lake_proxy_spark/ext/graft-acl-ext.jar -C "$OUT" graft
echo "built delta_lake_proxy_spark/ext/graft-acl-ext.jar"
