#!/bin/bash
# Poll for the axon TPU tunnel to come back (it died mid-round-3); once a
# real dispatch succeeds, run the queued re-measurement batch. Exits when
# done (or after ~6h of polling without success).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

for i in $(seq 1 72); do
  if timeout 180 python -c "
import jax, numpy as np
v = np.asarray(jax.numpy.ones((8, 8)) * 2)[0, 0]
assert v == 2.0
print('tpu-alive')
" 2>/dev/null | grep -q tpu-alive; then
    echo "TPU back at attempt $i $(date -u +%H:%M:%S)" | tee /tmp/tpu_poll.log
    bash scripts/tpu_remeasure_r3.sh
    echo REMEASURE-DONE
    exit 0
  fi
  echo "attempt $i dead $(date -u +%H:%M:%S)" >> /tmp/tpu_poll.log
  sleep 240
done
echo "gave up after 72 attempts" | tee -a /tmp/tpu_poll.log
exit 1
