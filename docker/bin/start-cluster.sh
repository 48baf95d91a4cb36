#!/usr/bin/env bash
# Bring up N server containers on one machine (parity:
# docker/bin/start-cluster.sh starting compute-node-i containers and mounting
# the Enron corpus at /root/data).
set -euo pipefail
N="${1:-2}"
IMAGE="${APSIM_IMAGE:-apsim-tpu}"
DATA="${APSIM_DATA:-$(pwd)/data/maildir_small}"
for i in $(seq 0 $((N - 1))); do
  port=$((2551 + i))
  docker run -d --name "compute-node-$i" \
    -p "$port:2551" \
    -v "$DATA:/root/data:ro" \
    "$IMAGE" serve --host 0.0.0.0 --port 2551
  echo "compute-node-$i on :$port"
done
