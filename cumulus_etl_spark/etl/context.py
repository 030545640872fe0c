"""JobContext: cross-run bookkeeping for incremental ETL
(ref cumulus_etl/etl/context.py:10-70).

A tiny JSON document in the PHI dir recording the last successful run's
timestamp and input/output locations — the next run (or an operator)
reads it to pick an incremental export window.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone


class JobContext:
    FILENAME = "job-context.json"

    def __init__(self, phi_dir: str):
        self.path = os.path.join(phi_dir, self.FILENAME)
        self._doc: dict = {}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                self._doc = json.load(fh)

    @property
    def last_successful_datetime(self) -> str | None:
        return self._doc.get("last_successful_datetime")

    @property
    def last_successful_input(self) -> str | None:
        return self._doc.get("last_successful_input_dir")

    @property
    def last_successful_output(self) -> str | None:
        return self._doc.get("last_successful_output_dir")

    def record_success(self, input_dir: str, output_dir: str) -> None:
        self._doc.update(
            {
                "last_successful_datetime": datetime.now(timezone.utc).isoformat(),
                "last_successful_input_dir": input_dir,
                "last_successful_output_dir": output_dir,
            }
        )
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._doc, fh, indent=2)
        os.replace(tmp, self.path)
