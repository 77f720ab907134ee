#!/usr/bin/env bash
# Launch a circuit on every host of a Cloud TPU pod slice.
#
#   deploy/run_pod.sh TPU_NAME ZONE circuit.json [extra pod_worker args]
#
# The reference's analogue is its docker-compose Spark cluster
# (v2_spark/docker-compose.cluster.yml) + spark-submit scripts; on TPU
# the "cluster" is the pod slice itself: the same SPMD program runs on
# every worker and jax.distributed autodetects the topology.
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
CIRCUIT=${3:?circuit file}
shift 3

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)

# Ship the package + circuit to all workers, then run the worker entry
# everywhere (--worker=all fans out; the processes rendezvous via the
# pod metadata, no coordinator flags needed).
gcloud compute tpus tpu-vm scp --recurse "$REPO_DIR" "$TPU_NAME":~/qst \
  --zone "$ZONE" --worker=all
gcloud compute tpus tpu-vm scp "$CIRCUIT" "$TPU_NAME":~/qst/circuit.in \
  --zone "$ZONE" --worker=all
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd ~/qst && python deploy/pod_worker.py circuit.in $*"
