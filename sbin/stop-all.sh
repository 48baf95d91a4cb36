#!/usr/bin/env bash
# ssh fan-out stop (parity: sbin/stop-all.sh).
set -euo pipefail
APSIM_HOME="$(cd "$(dirname "$0")/.." && pwd)"
HOSTS_FILE="${1:-$APSIM_HOME/conf/servers}"
if [[ ! -f "$HOSTS_FILE" ]]; then
  exec "$APSIM_HOME/sbin/daemon.sh" stop
fi
while read -r host; do
  [[ -z "$host" || "$host" == \#* ]] && continue
  echo "stopping on $host"
  ssh "$host" "$APSIM_HOME/sbin/daemon.sh" stop &
done < "$HOSTS_FILE"
wait
