"""Shared server plumbing: non-blocking terminal delivery for bounded queues."""
from __future__ import annotations

import queue


def terminal_put(q: "queue.Queue", item) -> None:
    """Deliver a terminal sentinel (None or an Exception) without ever
    blocking: if the bounded queue is full because the consumer stopped
    draining, evict the oldest chunk to make room.

    Guarantees two things the streaming bridges depend on:
    - the producer always exits (no wedged scheduler/producer thread), and
    - any consumer executor thread still blocked in q.get() wakes up
      (no leaked ThreadPoolExecutor workers after a client disconnect —
      the default pool has only ~5 workers on a 1-core host).
    """
    while True:
        try:
            q.put_nowait(item)
            return
        except queue.Full:
            try:
                q.get_nowait()
            except queue.Empty:
                pass
