#!/usr/bin/env bash
# ssh fan-out start of apsim servers on every host in conf/servers
# (parity: sbin/start-all.sh loops `ssh $host daemon.sh start`).
set -euo pipefail
APSIM_HOME="$(cd "$(dirname "$0")/.." && pwd)"
HOSTS_FILE="${1:-$APSIM_HOME/conf/servers}"
shift || true
if [[ ! -f "$HOSTS_FILE" ]]; then
  echo "no hosts file at $HOSTS_FILE; starting locally" >&2
  exec "$APSIM_HOME/sbin/daemon.sh" start "$@"
fi
while read -r host; do
  [[ -z "$host" || "$host" == \#* ]] && continue
  echo "starting on $host"
  ssh "$host" "$APSIM_HOME/sbin/daemon.sh" start "$@" &
done < "$HOSTS_FILE"
wait
