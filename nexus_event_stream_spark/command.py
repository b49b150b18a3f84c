"""Command side — the control plane's write API, event-log-first.

The reference persists Signals in PostgreSQL and publishes domain events
after commit (control-plane/nexus/core/signals.py:58-88). In this engine
the event log IS the source of truth (SURVEY.md §2.1 "transactional
outbox" row): a command appends an envelope to the log (a local JSON-lines
directory consumed by ``sources.file_event_stream``, or Kafka via
``sources.kafka_sink`` in production) and the streaming projection folds
it into the serving view.

Envelope parity (FIXTURES.md §1):
- ``action`` ∈ created/updated/deleted;
- priority stored as the display string (Low/Medium/High — signals.py:51);
- timestamps ISO-8601 with offset (signals.py:53-54);
- delete envelope is exactly ``{action, id}`` (tests.py:134-139);
- one file per command batch ≈ one producer flush; files appear atomically
  (write-then-rename) so a concurrent stream never reads half a batch.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile
import threading
import uuid

from nexus_event_stream_spark.schemas import PRIORITY_SCORES

PRIORITY_DISPLAY = {v: k for k, v in PRIORITY_SCORES.items()}


class SignalCommands:
    """Append-only command API over a local JSON-lines event log."""

    def __init__(self, log_dir: str, author: str = "system"):
        self.log_dir = log_dir
        self.author = author
        self._state: dict[str, dict] = {}  # id → last written entity fields
        # serving_http drives this from a ThreadingHTTPServer: the seq
        # increment + _state read-modify-write + append must be atomic or
        # two writers can claim the same cmd-N and os.replace silently
        # drops one command from the source-of-truth log
        self._lock = threading.Lock()
        os.makedirs(log_dir, exist_ok=True)
        # Resume the sequence after existing log files — the log is the
        # source of truth, so a restarted writer must never overwrite it.
        existing = [
            int(name[4:12])
            for name in os.listdir(log_dir)
            if name.startswith("cmd-") and name.endswith(".json")
        ]
        self._seq = max(existing, default=0)
        # Replay the log into _state: the log is the source of truth, so a
        # restarted writer must accept update()/delete() on entities created
        # before the restart (previously they raised KeyError).
        for seq in sorted(existing):
            with open(os.path.join(log_dir, f"cmd-{seq:08d}.json")) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    ev = json.loads(line)
                    if ev.get("action") == "deleted":
                        self._state.pop(ev["id"], None)
                    else:
                        self._state[ev["id"]] = {
                            k: v for k, v in ev.items() if k != "action"
                        }

    # -- internals ----------------------------------------------------------

    def _now(self) -> str:
        return dt.datetime.now(dt.timezone.utc).isoformat()

    def _append(self, payload: dict) -> None:
        self._seq += 1
        name = f"cmd-{self._seq:08d}"
        fd, tmp = tempfile.mkstemp(dir=self.log_dir, prefix=f".{name}")
        with os.fdopen(fd, "w") as fh:
            fh.write(json.dumps(payload) + "\n")
        os.replace(tmp, os.path.join(self.log_dir, f"{name}.json"))

    # -- commands (viewset create/update/destroy analogues) -----------------

    def create(
        self,
        title: str,
        content: str,
        priority: int = 1,
        author: str | None = None,
    ) -> str:
        """POST /signals — returns the new entity id (uuid4, models.py:21).

        ``priority`` is the integer code (1/2/3, default Low=1,
        models.py:32-35); the event carries the display string.
        """
        if priority not in PRIORITY_DISPLAY:
            raise ValueError(f"priority must be one of {sorted(PRIORITY_DISPLAY)}")
        id_ = str(uuid.uuid4())
        now = self._now()
        fields = {
            "id": id_,
            "title": title,
            "content": content,
            "priority": PRIORITY_DISPLAY[priority],
            "author": author or self.author,
            "created_at": now,
            "updated_at": now,
        }
        with self._lock:
            self._state[id_] = fields
            self._append({"action": "created", **fields})
        return id_

    def get(self, id_: str) -> dict:
        """Current entity fields as the command side knows them (the
        post-write representation a REST create/update response body
        carries — views.py:17-20's serializer output analogue)."""
        with self._lock:
            if id_ not in self._state:
                raise KeyError(id_)
            return dict(self._state[id_])

    def update(self, id_: str, **changes) -> None:
        """PUT/PATCH /signals/{id} — full envelope republished with a fresh
        updated_at (auto_now, models.py:38)."""
        with self._lock:
            if id_ not in self._state:
                raise KeyError(id_)
            fields = dict(self._state[id_])
            if "priority" in changes:
                if changes["priority"] not in PRIORITY_DISPLAY:
                    raise ValueError(
                        f"priority must be one of {sorted(PRIORITY_DISPLAY)}"
                    )
                changes["priority"] = PRIORITY_DISPLAY[changes["priority"]]
            for k, v in changes.items():
                if k not in fields or k in ("id", "created_at"):
                    raise ValueError(f"cannot update field {k!r}")
                fields[k] = v
            fields["updated_at"] = self._now()
            self._state[id_] = fields
            self._append({"action": "updated", **fields})

    def delete(self, id_: str) -> None:
        """DELETE /signals/{id} — 2-key envelope (tests.py:134-139)."""
        with self._lock:
            if id_ not in self._state:
                raise KeyError(id_)
            del self._state[id_]
            self._append({"action": "deleted", "id": id_})
