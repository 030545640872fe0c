"""cTAKES custom-dictionary (BSV) plumbing (ref nlp/watcher.py:107-170).

The reference lets a study swap in its own symptom vocabulary: a BSV
file (``CUI|TUI|STR|PREF`` — or the 6-column ``ctakesclient`` form
``CUI|TUI|CODE|SAB|STR|PREF``) is converted to the 4-column layout
cTAKES expects and dropped into an *overrides* folder that a
cooperating cTAKES docker image watches; writing the file triggers a
server restart with the new dictionary loaded.

Offline parity: the conversion and the file drop are implemented
exactly (same column selection, same ``symptoms.bsv`` target, same
graceful skips when no overrides folder is configured); the
restart-wait becomes a pluggable ``ready_check`` callback (the CLI
passes ``wait_for_service``) since there is no server to manage in
this sandbox. ``CtakesHttpModel`` carries ``bsv_path`` /
``overrides_dir`` so a non-covid study task installs its vocabulary
before the first extraction request goes out.
"""

from __future__ import annotations

import logging
import os

DICTIONARY_FILENAME = "symptoms.bsv"


def convert_bsv_text(text: str) -> str:
    """Convert BSV dictionary text to the 4-column ``CUI|TUI|STR|PREF``
    layout cTAKES expects (ref nlp/watcher.py:107-131): 6-column
    ``ctakesclient`` rows keep their first two and last two columns,
    4-column rows pass through, comments/blank lines and short rows are
    dropped."""
    out = []
    for line in text.splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        columns = line.split("|")
        if len(columns) > 4:
            out.append(f"{columns[0]}|{columns[1]}|{columns[-2]}|{columns[-1]}")
        elif len(columns) == 4:
            out.append(line)
    return "\n".join(out)


def parse_bsv_rows(text: str) -> list[dict]:
    """Parse a (possibly 6-column) BSV dictionary into
    ``{cui, tui, text, pref}`` rows — the in-memory form stub models and
    tests match against."""
    rows = []
    for line in convert_bsv_text(text).splitlines():
        cui, tui, s, pref = line.split("|")
        rows.append({"cui": cui, "tui": tui, "text": s, "pref": pref})
    return rows


def install_ctakes_dictionary(
    overrides_dir: str | None, bsv_path: str, ready_check=None
) -> bool:
    """Convert ``bsv_path`` and write it as ``symptoms.bsv`` into the
    cTAKES overrides folder (ref nlp/watcher.py:134-170). Returns False
    with a warning — not an error — when no overrides folder is
    configured or it doesn't exist, matching the reference's graceful
    skips (tests and default setups run without the override docker).
    ``ready_check()`` is invoked after the write as the offline analog
    of ``wait_for_ctakes_restart`` (the CLI passes a service ping)."""
    if not overrides_dir:
        logging.warning("Warning: --ctakes-overrides is not defined.")
        return False
    if not os.path.isdir(overrides_dir):
        logging.warning(
            "Warning: the cTAKES overrides folder does not exist at:\n"
            f"  {overrides_dir}\nConsider using --ctakes-overrides."
        )
        return False
    with open(bsv_path) as fh:
        converted = convert_bsv_text(fh.read())
    with open(os.path.join(overrides_dir, DICTIONARY_FILENAME), "w") as fh:
        fh.write(converted)
    if ready_check is not None:
        ready_check()
    return True
