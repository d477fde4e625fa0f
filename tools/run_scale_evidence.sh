#!/bin/bash
# Round-13 scale-evidence sweep: scale-correctness ledgers (sf1 full,
# sf3/sf10 subsets + the sampled sim_knn_join differential at sf10) and
# the R15 bench curves (one build, one harness, min-of-3, noop sink).
# Sequential on purpose — sbt invocations must never overlap.
set -e
cd /root/repo
SFB=target/sfbig

# subset lists reproduce the r12 ledger ids exactly (stability across
# rounds is what makes the curves comparable); sf10 gains sim_knn_join
# via the sampled-query differential check
SF3_IDS=$(python3 -c "import json;print(','.join(sorted(json.load(open('CORRECTNESS_SF3.json'))['queries'])))")
SF10_IDS=$(python3 -c "import json;print(','.join(sorted(json.load(open('CORRECTNESS_SF10.json'))['queries'])))")
CURVE_Q=dedup_clusters,dedup_exact,dedup_minhash,dedup_multimodal_clusters,dedup_recall_report,pipeline_dsir,pipeline_gopher_rules,pipeline_quality_classifier,pipeline_sample_weighted,pipeline_soft_dedup,sample_stratified,sim_index_upsert,sim_ivf_stats,sim_knn_join,text_readability
CURVE30_Q=dedup_clusters,dedup_exact,dedup_multimodal_clusters,dedup_recall_report,pipeline_dsir,pipeline_gopher_rules,pipeline_quality_classifier,sim_ivf_stats,sim_knn_join,text_readability

echo "== [1/8] full bench ledger at sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01.log 2>&1
cp BENCH_LOCAL.json /tmp/bench_sf01_full.json
git checkout BENCH_LOCAL.json

echo "== [2/8] sf1 full verify =="
sbt -batch "runMain graft.Verify $SFB/sf1 /tmp/vout_sf1" \
  > /tmp/verify_sf1.log 2>&1
python3 tools/selfcheck.py $SFB/sf1 /tmp/vout_sf1 \
  > /tmp/selfcheck_sf1.log 2>&1 || true
tail -1 /tmp/selfcheck_sf1.log

echo "== [3/8] sf3 subset verify =="
sbt -batch "runMain graft.Verify $SFB/sf3 /tmp/vout_sf3 $SF3_IDS" \
  > /tmp/verify_sf3.log 2>&1
python3 tools/selfcheck.py $SFB/sf3 /tmp/vout_sf3 $SF3_IDS \
  > /tmp/selfcheck_sf3.log 2>&1 || true
tail -1 /tmp/selfcheck_sf3.log

echo "== [4/8] sf10 subset verify + sampled sim_knn_join =="
sbt -batch "runMain graft.Verify $SFB/sf10 /tmp/vout_sf10 $SF10_IDS,sim_knn_join" \
  > /tmp/verify_sf10.log 2>&1
python3 tools/selfcheck.py $SFB/sf10 /tmp/vout_sf10 $SF10_IDS \
  > /tmp/selfcheck_sf10.log 2>&1 || true
python3 tools/kj_sampled_check.py $SFB/sf10 /tmp/vout_sf10 \
  >> /tmp/selfcheck_sf10.log 2>&1 || true
tail -2 /tmp/selfcheck_sf10.log

for sf in 1 3 10; do
  n=$((4 + sf / 3))
  echo "== [$n/8] R15 curve at sf$sf =="
  SPARK_GRAFT_SF_DIR=$PWD/$SFB/sf$sf SPARK_GRAFT_BENCH_ONLY=$CURVE_Q \
    sbt -batch "runMain graft.Bench" > /tmp/curve_sf$sf.log 2>&1
  cp BENCH_LOCAL.json /tmp/curve_sf$sf.json
  git checkout BENCH_LOCAL.json
done

echo "== [8/8] R15 curve at sf30 =="
SPARK_GRAFT_SF_DIR=$PWD/$SFB/sf30 SPARK_GRAFT_BENCH_ONLY=$CURVE30_Q \
  sbt -batch "runMain graft.Bench" > /tmp/curve_sf30.log 2>&1
cp BENCH_LOCAL.json /tmp/curve_sf30.json
git checkout BENCH_LOCAL.json

# reinstate the sf0.1 full ledger as the committed BENCH_LOCAL.json
cp /tmp/bench_sf01_full.json BENCH_LOCAL.json
echo "ALL DONE"
