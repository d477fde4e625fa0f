#!/bin/bash
# Round-14 scale-evidence sweep: scale-correctness ledgers (sf1 full,
# sf3/sf10 subsets + the sampled sim_knn_join differential at sf10) and
# the R16 bench curves (one build, one harness, min-of-3, noop sink),
# sf30 included in the MAIN flow (round-13: the sf30 run started after
# the final commit and produced no artifact). Every ledger artifact is
# regenerated through mk_correctness_json.py, which stamps the build
# commit + surface size — staleness is mechanical to detect now.
# Sequential on purpose — sbt invocations must never overlap.
set -e
cd /root/repo
SFB=target/sfbig

# subset lists reproduce the committed ledger ids (stability across
# rounds is what makes the curves comparable) plus the round-14
# sim_index_retrain; sf10 gains sim_knn_join via the sampled-query
# differential check
SF3_IDS=$(python3 -c "import json;print(','.join(sorted(set(json.load(open('CORRECTNESS_SF3.json'))['queries'])|{'sim_index_retrain'})))")
# sim_index_retrain joins the sf3 subset only: its DuckDB twin retrains
# the quantizer over the union corpus, and at sf10 (1M vectors) the
# oracle-side Lloyd chain spilled >57 GB and filled the disk even under
# the bounded config (measured round 14) — the op stays proven at
# sf0.001/0.01/1/3; sf10 keeps the tractable-oracle subset rule
SF10_IDS=$(python3 -c "import json;print(','.join(sorted(set(json.load(open('CORRECTNESS_SF10.json'))['queries'])-{'sim_index_retrain'})))")
CURVE_Q=dedup_clusters,dedup_exact,dedup_minhash,dedup_multimodal_clusters,dedup_recall_report,dedup_semantic,pipeline_dsir,pipeline_gopher_rules,pipeline_quality_classifier,pipeline_sample_weighted,pipeline_soft_dedup,sample_stratified,sim_index_upsert,sim_ivf_stats,sim_knn_join,text_readability
CURVE30_Q=dedup_clusters,dedup_exact,dedup_multimodal_clusters,dedup_recall_report,dedup_semantic,pipeline_dsir,pipeline_gopher_rules,pipeline_quality_classifier,sim_ivf_stats,sim_knn_join,text_readability
SF10_NOTE="tractable-oracle subset regenerated on this commit with the bounded DuckDB oracle (memory_limit+spill+retry); sim_knn_join is covered by the sampled-query differential (full engine-side join, oracle restricted to the pinned query stride) recorded in its 'check' field"

step=0
label() { step=$((step + 1)); echo "== [$step/9] $1 =="; }

label "full bench ledger at sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_sf01.log 2>&1
cp BENCH_LOCAL.json /tmp/bench_sf01_full.json
git checkout BENCH_LOCAL.json

label "sf1 full verify"
sbt -batch "runMain graft.Verify $SFB/sf1 /tmp/vout_sf1" \
  > /tmp/verify_sf1.log 2>&1
python3 tools/selfcheck.py $SFB/sf1 /tmp/vout_sf1 \
  > /tmp/selfcheck_sf1.log 2>&1 || true
tail -1 /tmp/selfcheck_sf1.log
python3 tools/mk_correctness_json.py /tmp/selfcheck_sf1.log \
  CORRECTNESS_SF1.json 1 CORRECTNESS_r13.json

label "sf3 subset verify"
sbt -batch "runMain graft.Verify $SFB/sf3 /tmp/vout_sf3 $SF3_IDS" \
  > /tmp/verify_sf3.log 2>&1
python3 tools/selfcheck.py $SFB/sf3 /tmp/vout_sf3 $SF3_IDS \
  > /tmp/selfcheck_sf3.log 2>&1 || true
tail -1 /tmp/selfcheck_sf3.log
python3 tools/mk_correctness_json.py /tmp/selfcheck_sf3.log \
  CORRECTNESS_SF3.json 3 CORRECTNESS_r13.json

label "sf10 subset verify + sampled sim_knn_join"
sbt -batch "runMain graft.Verify $SFB/sf10 /tmp/vout_sf10 $SF10_IDS,sim_knn_join" \
  > /tmp/verify_sf10.log 2>&1
python3 tools/selfcheck.py $SFB/sf10 /tmp/vout_sf10 $SF10_IDS \
  > /tmp/selfcheck_sf10.log 2>&1 || true
python3 tools/kj_sampled_check.py $SFB/sf10 /tmp/vout_sf10 \
  >> /tmp/selfcheck_sf10.log 2>&1 || true
tail -2 /tmp/selfcheck_sf10.log
python3 tools/mk_correctness_json.py /tmp/selfcheck_sf10.log \
  CORRECTNESS_SF10.json 10 CORRECTNESS_r13.json "--note=$SF10_NOTE"

for sf in 1 3 10; do
  label "R16 curve at sf$sf"
  SPARK_GRAFT_SF_DIR=$PWD/$SFB/sf$sf SPARK_GRAFT_BENCH_ONLY=$CURVE_Q \
    sbt -batch "runMain graft.Bench" > /tmp/curve_sf$sf.log 2>&1
  python3 tools/mk_curve_json.py BENCH_LOCAL.json \
    BENCH_CURVE_R16_SF$sf.json /root/testdata/sf0.1 $((sf * 10))
  git checkout BENCH_LOCAL.json
done

label "R16 curve at sf30"
SPARK_GRAFT_SF_DIR=$PWD/$SFB/sf30 SPARK_GRAFT_BENCH_ONLY=$CURVE30_Q \
  sbt -batch "runMain graft.Bench" > /tmp/curve_sf30.log 2>&1
python3 tools/mk_curve_json.py BENCH_LOCAL.json \
  BENCH_CURVE_R16_SF30.json /root/testdata/sf0.1 300
git checkout BENCH_LOCAL.json

label "reinstate the sf0.1 full ledger as BENCH_LOCAL.json"
cp /tmp/bench_sf01_full.json BENCH_LOCAL.json
echo "ALL DONE"
