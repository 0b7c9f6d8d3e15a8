"""Distributed rate limiting (O4): shared Redis token bucket.

Reference (ondine/utils/redis_rate_limiter.py, spec
ondine/core/specifications.py:430-446): a token bucket in Redis scoped by
``provider:model`` shared across all workers, with graceful fallback to
the local bucket when Redis is unreachable.

On Spark this is the exact global limit across executors (the local
bucket divides rpm by task slots — correct on average, bursty per
worker). redis-py is not installed in this environment — import-guarded;
the Lua script keeps acquire atomic server-side.
"""

from __future__ import annotations

import time

# atomic token-bucket take: KEYS[1]=bucket key, ARGV=[rate_per_s, capacity,
# now]; returns seconds to wait (0 = token granted)
_LUA = """
local key = KEYS[1]
local rate = tonumber(ARGV[1])
local cap = tonumber(ARGV[2])
local now = tonumber(ARGV[3])
local data = redis.call('HMGET', key, 'tokens', 'updated')
local tokens = tonumber(data[1]) or cap
local updated = tonumber(data[2]) or now
tokens = math.min(cap, tokens + (now - updated) * rate)
local wait = 0
if tokens >= 1 then
  tokens = tokens - 1
else
  wait = (1 - tokens) / rate
end
redis.call('HMSET', key, 'tokens', tokens, 'updated', now)
redis.call('EXPIRE', key, 120)
return tostring(wait)
"""


class RedisTokenBucket:
    """Shared bucket; acquire() blocks until a token is granted. Falls back
    to granting immediately (with a warning) when Redis errors — the local
    per-worker bucket remains the safety net (reference fallback
    semantics)."""

    def __init__(self, url: str, scope: str, rpm: float, burst: float | None = None):
        try:
            import redis
        except ImportError as e:
            raise ImportError(
                "redis-py is not installed; use the local token bucket "
                "(ProcessingSpec.rate_limit_rpm) or install redis"
            ) from e
        self._redis = redis.Redis.from_url(url)
        self._script = self._redis.register_script(_LUA)
        self.key = f"ondine_spark:bucket:{scope}"
        self.rate = rpm / 60.0
        self.capacity = burst if burst is not None else max(1.0, rpm / 60.0)
        self._degraded = False

    def acquire(self) -> None:
        while True:
            try:
                wait = float(self._script(
                    keys=[self.key],
                    args=[self.rate, self.capacity, time.time()],
                ))
            except Exception:
                if not self._degraded:
                    import logging

                    logging.getLogger("ondine_spark").warning(
                        "redis rate limiter unreachable; degrading to "
                        "unthrottled (local bucket still applies)"
                    )
                    self._degraded = True
                return
            if wait <= 0:
                return
            time.sleep(min(wait, 1.0))
