"""Per-element wall-clock deadlines inside Arrow batch stages.

Reference analog: every reference extractor bounds its subprocess at
20-30 s (csxextract/extractors/pdfbox.py:24, parscit.py:31,
filters.py:29 — `defTimeout`); a document that hangs is recorded as an
error, not a stuck worker. A vectorized UDF has no subprocess to kill,
and CPython cannot interrupt a C-level call (catastrophic regex
backtracking, a runaway parser) from a signal handler — signals are
only checked between bytecodes. So the deadline path runs each element
in a one-worker process pool and HARD-KILLS the worker on timeout,
then rebuilds the pool for the next element.

This costs a pickle round-trip per element, so it is opt-in per stage
(`extract_pages(..., row_timeout=30)`): the hot path stays in-process;
enable the deadline on untrusted/hostile inputs where one pathological
row would otherwise stall a task for the whole task-retry budget —
non-negotiable at 10^12 documents.
"""

from __future__ import annotations

import concurrent.futures as cf


def _invoke(payload: bytes, *args):
    """Module-level trampoline: plain pickle can't ship closures/local
    functions to the pool worker, so the callable travels as a
    cloudpickle payload (same serializer PySpark uses for UDFs)."""
    from pyspark import cloudpickle

    return cloudpickle.loads(payload)(*args)


class DeadlineRunner:
    """Run callables with a per-call wall-clock deadline.

    Returns (result, None) on success, (None, 'Timeout') when the
    deadline passes (the worker process is killed), or (None, '<err>')
    when the callable raises. One runner per partition: the pool is
    reused across rows and only rebuilt after a kill.
    """

    def __init__(self, seconds: float):
        self.seconds = seconds
        self._pool: cf.ProcessPoolExecutor | None = None
        self._payloads: dict[int, bytes] = {}

    def _ensure(self) -> cf.ProcessPoolExecutor:
        if self._pool is None:
            self._pool = cf.ProcessPoolExecutor(max_workers=1)
        return self._pool

    def _payload(self, fn) -> bytes:
        key = id(fn)
        if key not in self._payloads:
            from pyspark import cloudpickle

            self._payloads[key] = cloudpickle.dumps(fn)
        return self._payloads[key]

    def run(self, fn, *args):
        try:
            fut = self._ensure().submit(_invoke, self._payload(fn), *args)
        except Exception:
            # pool broken by an earlier worker death: rebuild once and retry
            self.close()
            fut = self._ensure().submit(_invoke, self._payload(fn), *args)
        try:
            return fut.result(timeout=self.seconds), None
        except (cf.TimeoutError, TimeoutError) as exc:
            # On 3.11+ concurrent.futures.TimeoutError IS builtin
            # TimeoutError; on 3.8-3.10 they are distinct classes, so
            # both must be caught or the deadline expiry would fall into
            # the generic handler and the hung worker would never be
            # killed. fut.done() separates the cases: done => the worker
            # raised (healthy, error is data); not done => deadline
            # expiry (kill worker).
            if fut.done():
                return None, f"{type(exc).__name__}: {exc}"
            pool = self._pool
            for p in pool._processes.values():  # noqa: SLF001 — kill, not join
                p.kill()
            pool.shutdown(wait=False)
            self._pool = None
            return None, "Timeout"
        except cf.process.BrokenProcessPool:
            # worker died mid-call (segfault/OOM-kill): error is data,
            # and the pool must be rebuilt or every later row would raise
            self.close()
            return None, "BrokenProcessPool: worker died"
        except Exception as exc:  # worker raised: error is data
            return None, f"{type(exc).__name__}: {exc}"

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
