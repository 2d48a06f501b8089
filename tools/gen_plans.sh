#!/bin/bash
# Regenerate PLANS.md (headline-query physical plans). Requires sbt package first.
cd "$(dirname "$0")/.." && sbt -batch package && \
/opt/spark/bin/spark-shell --master 'local[8]' \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.extensions=graft.plans.GraftExtensions \
  --jars target/scala-2.13/mercurygatespark_2.13-0.1.0.jar -I tools/plans_gen.scala
