"""Worker-thread template.

Counterpart of the reference WorkerProcess
(/root/reference/src/acmpc/worker/base.py:7-64): a daemon worker with the
same _setup/_runtime_setup/_work template, as a thread (JAX device
dispatch releases the GIL, and threads share the jit cache the processes
could not). Waits on a mailbox instead of busy-spinning on staleness
flags.
"""

from __future__ import annotations

import threading
from typing import Optional

from acmpc_tpu.runtime.mailbox import Mailbox


class WorkerThread(threading.Thread):
    """Subclass and implement ``_work(item)``; optionally ``_setup`` (on
    the caller thread) and ``_runtime_setup`` (first thing on the worker
    thread, e.g. model loading so weights live where they are used)."""

    def __init__(self, inbox: Optional[Mailbox] = None, name: str = "acmpc-worker"):
        super().__init__(daemon=True, name=name)
        self.inbox = inbox or Mailbox()
        self._stop_event = threading.Event()
        self._version = 0
        self._setup()

    # -- template hooks --------------------------------------------------
    def _setup(self):
        pass

    def _runtime_setup(self):
        pass

    def _work(self, item):
        raise NotImplementedError

    # -- lifecycle -------------------------------------------------------
    @property
    def is_running(self) -> bool:
        return not self._stop_event.is_set()

    def submit(self, item):
        self.inbox.post(item)

    def stop(self, join: bool = True, timeout: float = 5.0):
        self._stop_event.set()
        self.inbox.post(None)
        if join and self.is_alive():
            self.join(timeout=timeout)

    def run(self):
        self._runtime_setup()
        while not self._stop_event.is_set():
            item, version, _ = self.inbox.read_fresh(self._version, timeout=0.5)
            if version == self._version or item is None:
                continue
            self._version = version
            try:
                self._work(item)
            except Exception:  # keep the loop alive like the reference
                import traceback

                traceback.print_exc()
