"""Multi-table atomic transactions over LakeTables.

Reference analog: ``PostgresDB.execute_transaction``
(``system/system/database_connections/pg_db.py:440-475``) runs N
operations in one database transaction. The lake commits per table, so a
multi-table change (e.g. the J5 FK-CASCADE delete: parent delete + child
tombstones) needs its own protocol. This is the classic two-phase
pointer swap with a roll-forward intent log — the same shape an Iceberg
catalog uses for multi-table commits:

1. **Stage**: each operation runs fully (data files + next manifest
   written) but the table's ``meta/_current`` pointer is NOT flipped —
   readers keep the old snapshot.
2. **Commit point**: one intent file listing every (table, version) is
   atomically written to the transaction log dir.
3. **Publish**: each pointer is flipped; the intent file is removed.

Crash before the intent write → nothing published; the staged manifests
are inert (the next commit simply overwrites them). Crash after →
``recover()`` rolls every listed pointer FORWARD, so the transaction is
all-or-nothing across tables. Readers between publish flips can observe
one table new / one old for an instant — per-table snapshot isolation is
preserved; cross-table atomicity is crash-atomic, as with any catalog
that swaps pointers sequentially.

Single-writer per table is assumed (as elsewhere in the lake); the
intent log dir is the coordinator.
"""

from __future__ import annotations

import json
import os
import uuid

from tiger_etl_spark.lake.table import LakeTable, _atomic_write


class LakeTransaction:
    def __init__(self, txn_dir: str):
        self.txn_dir = txn_dir
        os.makedirs(txn_dir, exist_ok=True)
        self._tables: list[LakeTable] = []
        self._done = False

    # ------------------------------------------------------------ staging
    def _track(self, table: LakeTable) -> None:
        if table not in self._tables:
            table._defer_pointer = True
            self._tables.append(table)

    def merge(self, table: LakeTable, *args, **kwargs):
        self._track(table)
        return table.merge(*args, **kwargs)

    def delete_where(self, table: LakeTable, *args, **kwargs):
        self._track(table)
        return table.delete_where(*args, **kwargs)

    def truncate(self, table: LakeTable) -> None:
        self._track(table)
        table.truncate()

    def update_props(self, table: LakeTable, updates: dict) -> None:
        self._track(table)
        table.update_props(updates)

    # ----------------------------------------------------------- lifecycle
    def commit(self) -> None:
        """Atomically publish every staged table's snapshot (see module
        docstring for the crash windows)."""
        if self._done:
            raise RuntimeError("transaction already finished")
        intent_path = os.path.join(self.txn_dir, f"txn-{uuid.uuid4().hex}.json")
        intent = {
            "tables": [
                {"path": t.path, "version": t.manifest["version"]}
                for t in self._tables
            ]
        }
        _atomic_write(intent_path, json.dumps(intent))  # ← COMMIT POINT
        self._publish(intent)
        os.remove(intent_path)
        for t in self._tables:
            t._defer_pointer = False
        self._done = True

    def abort(self) -> None:
        """Discard staged state: pointers were never flipped, so readers
        saw nothing. Staged manifests are deleted; in-memory handles are
        re-loaded from the published pointer. (Data files staged by the
        aborted ops become unreferenced orphans — harmless, and the next
        successful commit reuses their version slots.)"""
        if self._done:
            return
        for t in self._tables:
            t._defer_pointer = False
            with open(os.path.join(t.path, "meta", "_current")) as f:
                published = int(f.read().strip())
            for v in range(published + 1, t.manifest["version"] + 1):
                mp = os.path.join(t.path, "meta", f"v{v}.json")
                if os.path.exists(mp):
                    os.remove(mp)
            t.manifest = LakeTable.load(t.path).manifest
        self._done = True

    def __enter__(self) -> "LakeTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.commit()
        else:
            self.abort()

    # ----------------------------------------------------------- recovery
    @staticmethod
    def _publish(intent: dict) -> None:
        for entry in intent["tables"]:
            cur_path = os.path.join(entry["path"], "meta", "_current")
            with open(cur_path) as f:
                published = int(f.read().strip())
            if published < entry["version"]:
                LakeTable._write_pointer(entry["path"], entry["version"])

    @staticmethod
    def recover(txn_dir: str) -> int:
        """Roll forward any committed-but-unpublished transactions (run
        at startup, like checkpoint recovery). Returns the number of
        intents applied. Idempotent: already-published pointers are left
        alone."""
        if not os.path.isdir(txn_dir):
            return 0
        n = 0
        for fn in sorted(os.listdir(txn_dir)):
            if not (fn.startswith("txn-") and fn.endswith(".json")):
                continue
            p = os.path.join(txn_dir, fn)
            with open(p) as f:
                intent = json.load(f)
            LakeTransaction._publish(intent)
            os.remove(p)
            n += 1
        return n
