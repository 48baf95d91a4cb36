#!/usr/bin/env bash
set -euo pipefail
docker ps -a --format '{{.Names}}' | grep '^compute-node-' | while read -r c; do
  docker rm -f "$c"
done
