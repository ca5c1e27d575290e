"""API-parity twins of the reference's pure-python search structures
(reference data_struct.py:8-250): ``BPlusTree``/``BTree``, ``Node``,
``SearchResultType`` and ``IndexedList`` — the one reference module a
direct importer could previously not migrate (SURVEY "What's missing"
residual #1; the engine's own ROI path uses helper.RoiHelper's numpy
searchsorted + prefix-min instead and is unaffected).

Same observable behavior, different construction:

- ``IndexedList._index_the_list`` builds the balanced midpoint tree
  DIRECTLY by recursive bisection of the (sorted) base list — O(N)
  and shape-identical to the reference's O(N log N) insert-one-by-one
  loop — when the keys are STRICTLY increasing, because inserting
  range midpoints in its DFS order lands each node exactly at its
  bisection position. With DUPLICATE keys the reference's comparison
  routing (equal values go right) can carry a midpoint past its
  bisection position, so for duplicate-bearing lists the build
  replays the reference's insertion order (range midpoints,
  right half first) through the same equal-goes-right insert —
  shape-identical in both regimes (ADVICE r12; duplicate cases
  pinned in tests/test_data_struct_parity.py). Descent over that
  tree is plain BST search, so every (node, SearchResultType)
  result — which neighbor an absent probe reports — matches the
  reference bit-for-bit, including the shape-dependent
  predecessor-vs-successor choice.
- ``BTree.range_search`` prunes: it skips subtrees wholly outside
  [begin, end] (O(log N + k)) where the reference walks every node
  (O(N)); the returned in-order list is identical.
- The reference's ``print`` side effects in ``BTree.search`` /
  ``range_search`` are dropped (return values unchanged).

Like ``helper.py``/``config.py``, this is an API-compatibility shim:
nothing in the Spark engine depends on it.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, List, Tuple


class BPlusTree:
    """Plain (data, left, right) record, as in the reference."""

    def __init__(self, data):
        self.data = data
        self.left = None
        self.right = None


class BTree:
    """Unbalanced binary search tree over raw values. Equal inserts
    are no-ops (the reference inserts only on strict < or >)."""

    def __init__(self, data):
        self.data = data
        self.left = None
        self.right = None

    def insert(self, data) -> None:
        node = self
        if node.data is None:
            node.data = data
            return
        while True:
            if data < node.data:
                if node.left is None:
                    node.left = BTree(data)
                    return
                node = node.left
            elif data > node.data:
                if node.right is None:
                    node.right = BTree(data)
                    return
                node = node.right
            else:
                return

    def print_tree(self) -> None:
        if self.left:
            self.left.print_tree()
        print(self.data)
        if self.right:
            self.right.print_tree()

    def search(self, val):
        """The found value, or the reference's '"{val} Not Found"'
        string sentinel when absent."""
        node = self
        while node is not None:
            if val < node.data:
                node = node.left
            elif val > node.data:
                node = node.right
            else:
                return node.data
        return str(val) + " Not Found"

    def range_search(self, begin, end) -> list:
        """In-order values within [begin, end], inclusive. Subtrees
        wholly outside the range are pruned (the reference walks every
        node; the returned list is identical)."""
        out: list = []
        node, todo = self, []
        while node is not None or todo:
            while node is not None:
                todo.append(node)
                # everything left of a node below begin is below begin
                node = node.left if node.data >= begin else None
            node = todo.pop()
            if begin <= node.data <= end:
                out.append(node.data)
            # everything right of a node above end is above end
            node = node.right if node.data <= end else None
        return out


class SearchResultType(Enum):
    Exact = 0
    SmallestValueJustLarger = 1
    LargestValueJustSmaller = 2
    EmptyList = 4


class Node:
    """Binary search node carrying (value, original index, payload).
    Insert sends equal values RIGHT (the reference branches left only
    on ``node.value > value``); a search for an absent value reports
    the node where descent stopped — by the BST insertion-point
    property, always the probe's predecessor (tagged
    LargestValueJustSmaller) or successor (SmallestValueJustLarger),
    whichever the tree shape puts on the descent path."""

    __slots__ = ("value", "org_inx", "payload", "_left", "_right")

    def __init__(self, value: Any, org_inx: int, payload: Any) -> None:
        self.value = value
        self.org_inx = org_inx
        self.payload = payload
        self._left: Node | None = None
        self._right: Node | None = None

    def insert(self, v: Any, org_inx: int, payload: Any) -> None:
        node = self
        while True:
            if node.value > v:
                if node._left is None:
                    node._left = Node(v, org_inx, payload)
                    return
                node = node._left
            else:
                if node._right is None:
                    node._right = Node(v, org_inx, payload)
                    return
                node = node._right

    def search_value(self, v) -> Tuple["Node", SearchResultType]:
        node = self
        while True:
            if v < node.value:
                if node._left is None:
                    return node, SearchResultType.SmallestValueJustLarger
                node = node._left
            elif node.value < v:
                if node._right is None:
                    return node, SearchResultType.LargestValueJustSmaller
                node = node._right
            else:
                return node, SearchResultType.Exact

    def __repr__(self) -> str:
        left = repr(self._left) if self._left is not None else "None"
        right = repr(self._right) if self._right is not None else "None"
        shown = (
            f"{self.value}({self.payload})" if self.value is not None else "None"
        )
        return f'{{"value":"{shown}", "left":{left}, "right":{right} }}'


class IndexedList:
    """Immutable sorted-list index: O(log N) search for an exact
    value, the largest value just smaller, or the smallest value just
    larger, plus the prefix/suffix slices around a probe. The base
    list must be sorted by ``get_value_func`` (the reference's
    implicit precondition — it indexes roi keys)."""

    def __init__(self, base_list: List[Any], get_value_func=lambda v: v) -> None:
        self._list = base_list
        self.get_value_func = get_value_func
        self.node: Node | None = self._index_the_list()

    def _index_the_list(self) -> Node | None:
        """Build the balanced midpoint tree. Strictly-increasing keys
        take the O(N) direct-bisection path: the node for range
        [lo, hi) holds the range's midpoint element and its subtrees
        index the two half-ranges — the same tree the reference grows
        by inserting midpoints one at a time, built without any
        comparisons. When the (sorted) keys contain DUPLICATES that
        equivalence breaks — the reference's equal-goes-right insert
        can route a duplicate midpoint past its bisection slot — so
        the build replays the reference's insertion order instead:
        each range yields its midpoint, then the right half-range,
        then the left, and every element after the root goes through
        the comparison-routed ``Node.insert`` (O(N log N), exactly
        the reference's shape)."""
        lst, get = self._list, self.get_value_func
        n = len(lst)
        if n == 0:
            return None
        keys = [get(v) for v in lst]
        if all(keys[i] < keys[i + 1] for i in range(n - 1)):

            def build(lo: int, hi: int) -> Node | None:
                if lo >= hi:
                    return None
                mid = (lo + hi) // 2
                node = Node(keys[mid], mid, lst[mid])
                node._left = build(lo, mid)
                node._right = build(mid + 1, hi)
                return node

            return build(0, n)

        def midpoints(lo: int, hi: int):
            if lo >= hi:
                return
            mid = (lo + hi) // 2
            yield mid
            yield from midpoints(mid + 1, hi)
            yield from midpoints(lo, mid)

        order = midpoints(0, n)
        root_inx = next(order)
        root = Node(keys[root_inx], root_inx, lst[root_inx])
        for inx in order:
            root.insert(keys[inx], inx, lst[inx])
        return root

    def search_closet_value(self, value: Any) -> Tuple[Node | None, SearchResultType]:
        if self.node is None:
            return None, SearchResultType.EmptyList
        # the probe passes through get_value_func too (reference quirk,
        # kept: callers probe with raw keys and the default identity)
        return self.node.search_value(self.get_value_func(value))

    def search_value(self, value: Any) -> Node | None:
        node, s = self.search_closet_value(value)
        return node if s == SearchResultType.Exact else None

    def search_value_left(self, value: Any) -> List:
        node, s = self.search_closet_value(value)
        if node is None:
            return []
        inx = node.org_inx
        if s in (SearchResultType.Exact, SearchResultType.LargestValueJustSmaller):
            return self._list[: inx + 1]
        return self._list[:inx]

    def search_value_right(self, value: Any) -> List:
        node, s = self.search_closet_value(value)
        if node is None:
            return []
        inx = node.org_inx
        if s in (SearchResultType.Exact, SearchResultType.SmallestValueJustLarger):
            return self._list[inx:]
        return self._list[inx + 1 :]
