"""Per-run logging: step timers + subprocess capture.

The reference writes a BASENAME.log capturing every subprocess's stdout plus
the exact command lines and wall-clock per step (BFQzip.py:52-57,98-145,
328-342); StepLogger is the same contract for library-call stages.
"""

from __future__ import annotations

import contextlib
import subprocess
import sys
import time


class StepLogger:
    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "a")

    def info(self, msg: str) -> None:
        print(msg)
        print(msg, file=self.f)
        self.f.flush()

    def command_line(self) -> None:
        print("command line: " + " ".join(sys.argv), file=self.f)
        self.f.flush()

    @contextlib.contextmanager
    def step(self, name: str):
        t0 = time.time()
        self.info(f"--- {name} ---")
        try:
            yield
        finally:
            self.info(f"    elapsed: {time.time() - t0:.4f}s")

    def run(self, cmd) -> None:
        """Run a subprocess with output captured into the log (the reference's
        execute_command, BFQzip.py:328-336)."""
        print("$ " + " ".join(cmd), file=self.f)
        self.f.flush()
        subprocess.check_call(cmd, stdout=self.f, stderr=self.f)

    def close(self) -> None:
        self.f.close()
