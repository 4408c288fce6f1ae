"""Continuous batched serving demo (new capability -- the reference runs
one sample per call on one core): requests stream into a BatchServer that
coalesces them into mesh-sharded batches.
"""

import numpy as np

from microflow_tpu import models
from microflow_tpu.parallel import BatchServer

model = models.person_detect()
server = BatchServer(model, max_batch=256, max_wait_ms=2.0)
# pre-compile the bucket this demo's traffic actually lands in (16
# requests x 4 rows coalesce to at most 64) and persist it: a restarted
# server loads the executable from disk instead of recompiling
server.warm(64)
try:
    rng = np.random.default_rng(0)
    futures = [
        server.submit(rng.uniform(0, 1, (4, 96, 96, 1)).astype(np.float32)) for _ in range(16)
    ]
    results = [f.result(timeout=120) for f in futures]
    print(f"served {sum(r.shape[0] for r in results)} requests,",
          f"mean person-prob {np.concatenate(results)[:, 0].mean():.3f}")
    print("server stats:", server.stats())  # serving counters (round 5)
finally:
    server.stop()
