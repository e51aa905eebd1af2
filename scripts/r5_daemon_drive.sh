#!/bin/bash
# Round-5 on-chip serving drive (VERDICT r4 directive #1a, re-run of the
# r4 attempt whose archived artifacts were crash tracebacks): serve an
# EXPORTED BUNDLE through the daemon on the real chip, answer real HTTP
# predictions, observe load shedding (429 + Retry-After) under a flood
# against a tiny queue bound, and SIGTERM-drain gracefully.
#
# Every dependent stage is GATED (ADVICE r4: the r4 cascade overwrote
# good logs with FileNotFound tracebacks because nothing checked its
# precondition).
#
# Usage: bash scripts/r5_daemon_drive.sh <ckpt_params_dir> <size>
set -x -o pipefail
cd /root/repo
CKPT=${1:-/tmp/r5_mini_ckpt/best}
SIZE=${2:-mini}
EVID=docs/evidence/r5_serving
mkdir -p "$EVID"

if [ ! -d "$CKPT" ]; then
    echo "GATE FAILED: checkpoint dir $CKPT does not exist" | tee "$EVID/GATE_FAILED"
    exit 1
fi

BUNDLE=/tmp/r5_model.wmx
rm -f "$BUNDLE"
timeout 2400 python -m weathermodel_tpu.cli.export \
  --checkpoint "$CKPT" --model weatherbert --model-size "$SIZE" \
  --output "$BUNDLE" --seq-len 365 --buckets 1,8,32 --platforms tpu \
  2>&1 | tee "$EVID/export.log"
if [ ! -f "$BUNDLE" ]; then
    echo "GATE FAILED: export produced no bundle at $BUNDLE" | tee "$EVID/GATE_FAILED"
    exit 1
fi

nohup python -m weathermodel_tpu.cli.serve --daemon --bundle "$BUNDLE" \
  --model weatherbert --model-size "$SIZE" --port 8491 \
  --batch-size 32 --max-queue-rows 48 --seq-len 365 \
  > "$EVID/daemon.log" 2>&1 &
echo $! > /tmp/r5_daemon.pid

python - <<'EOF' 2>&1 | tee docs/evidence/r5_serving/client.log
import io, json, time, http.client
import numpy as np

PORT = 8491

def wait_health(timeout=900):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            c = http.client.HTTPConnection("127.0.0.1", PORT, timeout=5)
            c.request("GET", "/healthz"); r = c.getresponse()
            if r.status == 200:
                return time.time() - t0
        except OSError:
            pass
        time.sleep(2.0)
    raise SystemExit("daemon never became healthy")

def post(n, timeout=120):
    rng = np.random.default_rng(n)
    buf = io.BytesIO()
    np.savez(buf, weather=rng.normal(size=(n, 365, 31)).astype(np.float32),
             coords=rng.uniform(-90, 90, size=(n, 2)).astype(np.float32))
    c = http.client.HTTPConnection("127.0.0.1", PORT, timeout=timeout)
    t0 = time.time()
    c.request("POST", "/predict", body=buf.getvalue(),
              headers={"Content-Type": "application/octet-stream"})
    r = c.getresponse(); body = r.read()
    dt = (time.time() - t0) * 1e3
    if r.status == 200:
        out = np.load(io.BytesIO(body))["output"]
        return r.status, dt, bool(np.isfinite(out).all()), out.shape, None
    return r.status, dt, None, None, r.getheader("Retry-After")

print("health after", round(wait_health(), 1), "s (incl. bucket warmup)")
for i in range(5):
    print("single:", post(1))
import concurrent.futures as cf
with cf.ThreadPoolExecutor(24) as ex:   # flood: 24 x 8 rows vs 48-row queue
    rs = list(ex.map(lambda _: post(8), range(24)))
codes = [r[0] for r in rs]
print("flood codes:", {c: codes.count(c) for c in set(codes)})
shed = [r for r in rs if r[0] == 429]
print("429 Retry-After samples:", [r[4] for r in shed[:3]])
ok = [r for r in rs if r[0] == 200]
print("200 finite:", all(r[2] for r in ok), "n_ok:", len(ok))
c = http.client.HTTPConnection("127.0.0.1", PORT, timeout=10)
c.request("GET", "/stats"); print("stats:", c.getresponse().read().decode())
EOF
CLIENT_RC=$?

kill -TERM "$(cat /tmp/r5_daemon.pid)"
sleep 10
tail -8 "$EVID/daemon.log"
if [ "$CLIENT_RC" -ne 0 ] || [ ! -s "$EVID/client.log" ]; then
    echo "GATE FAILED: client rc=$CLIENT_RC or empty client.log" | tee "$EVID/GATE_FAILED"
    exit 1
fi
echo "r5 daemon drive OK" | tee "$EVID/OK"
