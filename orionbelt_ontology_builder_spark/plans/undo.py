"""Undo/redo history stack over graph snapshots (SURVEY.md §2.7;
reference ``UndoManager``, ``ontology_manager.py:2904-2963``).

The reference snapshots the whole rdflib graph to N-Triples bytes per
checkpoint.  Here a snapshot is a *materialized DataFrame*: by default
``df.localCheckpoint(eager=True)`` — executor-memory-resident, cut off
from its lineage, O(1) to "restore" (it IS the DataFrame).  On a real
cluster the same stack rides on Iceberg snapshot ids (``VERSION AS OF``)
— inject ``snapshot_fn`` to return a table version token and
``restore_fn`` to read it back; the stack laws are identical either way.

Stack laws mirrored from the reference (tests/test_undo.py:6-102):
  * the initial state sits at the bottom and is never popped
    (undo at bottom returns None)
  * checkpoint pushes (label, snapshot), trims the stack to
    ``max_history`` from the bottom, and CLEARS the redo stack
  * undo moves the top to the redo stack and restores the new top,
    returning the restored state's label
  * redo moves back and restores, returning the redone label
  * ``undo_labels`` excludes the bottom entry; ``redo_labels`` lists
    next-redo last
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from pyspark.sql import DataFrame


def _default_snapshot(df: DataFrame) -> Any:
    return df.localCheckpoint(eager=True)


def _default_restore(token: Any) -> DataFrame:
    return token


class UndoManager:
    """History stack; reference ``UndoManager`` (``:2904-2963``)."""

    def __init__(
        self,
        initial: DataFrame,
        max_history: int = 50,
        snapshot_fn: Callable[[DataFrame], Any] = _default_snapshot,
        restore_fn: Callable[[Any], DataFrame] = _default_restore,
    ):
        self.max_history = max_history
        self._snapshot = snapshot_fn
        self._restore = restore_fn
        self._undo_stack: list[tuple[str, Any]] = [
            ("Initial state", snapshot_fn(initial))
        ]
        self._redo_stack: list[tuple[str, Any]] = []
        self.current: DataFrame = restore_fn(self._undo_stack[0][1])

    def checkpoint(self, df: DataFrame, label: str = "Edit") -> DataFrame:
        """Record ``df`` as the new current state (reference ``:2922-2928``:
        push, trim to max_history, clear redo)."""
        snap = self._snapshot(df)
        self._undo_stack.append((label, snap))
        if len(self._undo_stack) > self.max_history:
            self._undo_stack.pop(0)
        self._redo_stack.clear()
        self.current = self._restore(snap)
        return self.current

    def can_undo(self) -> bool:
        return len(self._undo_stack) > 1

    def can_redo(self) -> bool:
        return len(self._redo_stack) > 0

    def undo(self) -> Optional[str]:
        """Restore the previous state; returns its label, or None at the
        bottom (reference ``:2936-2944``)."""
        if not self.can_undo():
            return None
        self._redo_stack.append(self._undo_stack.pop())
        label, snap = self._undo_stack[-1]
        self.current = self._restore(snap)
        return label

    def redo(self) -> Optional[str]:
        """Re-apply the last undone state (reference ``:2946-2953``)."""
        if not self.can_redo():
            return None
        label, snap = self._redo_stack.pop()
        self._undo_stack.append((label, snap))
        self.current = self._restore(snap)
        return label

    @property
    def undo_labels(self) -> list[str]:
        return [label for label, _ in self._undo_stack[1:]]

    @property
    def redo_labels(self) -> list[str]:
        return [label for label, _ in self._redo_stack]
