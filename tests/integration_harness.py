"""Integration-test harness: the reference's NeklabTestCase pattern.

Mirrors /root/reference/test/lib/neklabTestCase.py structurally (SURVEY
section 4): example cases run as SUBPROCESSES (the analog of `mpiexec -np N
nek5000` with a SESSION.NAME), oracles are parsed from their structured
output, and assertions are DELAYED — assertAlmostEqualDelayed /
assertIsNotNullDelayed accumulate failures so one expensive run can check
many scalars, reported together at the end (neklabTestCase.py:95-133).

Where the reference greps free-form solver logs (get_value_from_log), the
examples here print a single JSON result line, which plays the role of the
eigs_output.txt convergence table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import unittest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class NeklabTPUTestCase(unittest.TestCase):
    """Base class with delayed assertions and example-case runners."""

    def setUp(self):
        self._delayed_failures: list[str] = []

    # -- delayed assertions (reference: neklabTestCase.py:95-133) ----------

    def assertAlmostEqualDelayed(self, value, target, delta, label):
        if value is None or abs(value - target) > delta:
            self._delayed_failures.append(
                f"{label}: expected {target} +- {delta}, got {value}"
            )
        else:
            print(f"    {label}: {value} == {target} +- {delta}  ok")

    def assertIsNotNullDelayed(self, value, label):
        if value is None:
            self._delayed_failures.append(f"{label}: missing")

    def assertDelayedFailures(self):
        if self._delayed_failures:
            self.fail(
                f"{len(self._delayed_failures)} delayed failure(s):\n  "
                + "\n  ".join(self._delayed_failures)
            )

    # -- case runner (reference: neklabBinRun.py) ---------------------------

    def run_example(self, script: str, args: list[str], timeout: float = 3000) -> dict:
        """Run an example script in a subprocess and parse its JSON result
        line (the analog of building + mpiexec-running a case and grepping
        its logs)."""
        cmd = [sys.executable, os.path.join(REPO, "examples", script), *args]
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO
        )
        if proc.returncode != 0:
            self.fail(
                f"example {script} failed (rc={proc.returncode}):\n"
                f"--- stdout ---\n{proc.stdout[-3000:]}\n"
                f"--- stderr ---\n{proc.stderr[-3000:]}"
            )
        result = None
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    result = json.loads(line)
                except json.JSONDecodeError:
                    continue
        self.assertIsNotNullDelayed(result, f"{script}: JSON result line")
        return result or {}
