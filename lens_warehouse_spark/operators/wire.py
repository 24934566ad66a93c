"""Wire-format surfaces of the reference's two read endpoints.

EP-1 (cohort query): lens-warehouse receives the CNF as a
transit/EDN-encoded query param and parses it in the Liberator
resource's ``malformed?`` hook (public repo ``src/lens/handler.clj``;
/root/reference empty, SURVEY.md §3.1). Here the wire format is JSON:

    {
      "include": [                      # AND of ORs (CNF)
        [ {"type": "order", "priorities": ["1-URGENT"]} ],
        [ {"type": "order", "date_from": "1996-01-01", "date_to": "1997-01-01"},
          {"type": "lineitem", "returnflags": ["R"]} ]
      ],
      "exclude": [ {"type": "subject", "max_balance": 0.0} ]
    }

EP-2 (browse pagination): page-size chunks with next-page keys
(``src/lens/util.clj`` paginate + hypermedia next links) — here a
keyset ``paginate`` helper that returns the page plus the continuation
token, the scalable alternative to OFFSET.
"""

from __future__ import annotations

import datetime
import math
import re

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_warehouse_spark.operators.cohort import (
    Atom,
    CohortQuery,
    LineitemAtom,
    OrderAtom,
    SubjectAttr,
)

_ATOM_TYPES = {
    "subject": (SubjectAttr, {"segments", "min_balance", "max_balance"}),
    "order": (
        OrderAtom,
        {"priorities", "statuses", "date_from", "date_to", "min_total"},
    ),
    "lineitem": (LineitemAtom, {"returnflags", "min_quantity", "max_quantity"}),
}
# Field-level type contract (the reference validates in the Liberator
# malformed? hook — bad payloads 400 at the wire, they never reach the
# query engine): list-of-string fields, numeric bounds, ISO date strings.
_LIST_FIELDS = {"segments", "priorities", "statuses", "returnflags"}
_NUM_FIELDS = {
    "min_balance", "max_balance", "min_total", "min_quantity", "max_quantity",
}
_DATE_FIELDS = {"date_from", "date_to"}


def atom_from_json(obj: dict[str, Any]) -> Atom:
    # Wire-facing parser contract: malformed payloads raise ValueError,
    # never AttributeError/TypeError (fuzz-pinned in tests/test_wire.py)
    if not isinstance(obj, dict):
        raise ValueError(f"atom must be a JSON object, got {type(obj).__name__}")
    kind = obj.get("type")
    # isinstance check first: an unhashable kind (list/dict) would make
    # the membership test itself raise TypeError, escaping the contract
    if not isinstance(kind, str) or kind not in _ATOM_TYPES:
        raise ValueError(f"unknown atom type {kind!r}; expected {sorted(_ATOM_TYPES)}")
    cls, allowed = _ATOM_TYPES[kind]
    kwargs = {}
    for k, v in obj.items():
        if k == "type":
            continue
        if k not in allowed:
            raise ValueError(f"unknown field {k!r} for atom type {kind!r}")
        if v is None:
            continue  # explicit JSON null == field unset (pre-round-5 behavior)
        if k in _LIST_FIELDS:
            if not isinstance(v, list) or not all(isinstance(x, str) for x in v):
                raise ValueError(f"field {k!r} must be a list of strings")
            kwargs[k] = tuple(v)
        elif k in _NUM_FIELDS:
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise ValueError(f"field {k!r} must be a number")
            if isinstance(v, float) and not math.isfinite(v):
                # NaN/inf pass isinstance(float) but compile to
                # always-false comparisons — a silently empty cohort
                raise ValueError(f"field {k!r} must be a finite number")
            kwargs[k] = v
        elif k in _DATE_FIELDS:
            if not isinstance(v, str):
                raise ValueError(f"field {k!r} must be a 'YYYY-MM-DD' string")
            # Validate the VALUE, not just the type: a malformed date
            # casts to NULL in the predicate and silently empties the
            # cohort instead of 400ing at the wire. fromisoformat alone
            # is too lax on Python 3.11+ ('20260814', ISO week dates
            # all parse but cast('timestamp') to NULL) — pin the exact
            # 'YYYY-MM-DD' shape first.
            if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", v):
                raise ValueError(
                    f"field {k!r} must be a valid 'YYYY-MM-DD' date, got {v!r}"
                )
            try:
                datetime.date.fromisoformat(v)
            except ValueError:
                raise ValueError(
                    f"field {k!r} must be a valid 'YYYY-MM-DD' date, got {v!r}"
                ) from None
            kwargs[k] = v
        else:  # unreachable while allowed == union of the three sets
            kwargs[k] = v
    return cls(**kwargs)


def cohort_from_json(obj: dict[str, Any]) -> CohortQuery:
    """Parse the JSON wire format into a CohortQuery (EP-1 malformed? hook).

    Malformed input of ANY shape raises ValueError — a wire endpoint
    must map bad payloads to 400, not 500 (fuzz-pinned)."""
    if not isinstance(obj, dict):
        raise ValueError(f"cohort payload must be a JSON object, got {type(obj).__name__}")
    include = obj.get("include")
    if not include or not isinstance(include, list):
        raise ValueError("'include' must be a non-empty list of disjunctions")
    disjunctions = []
    for d in include:
        if not d or not isinstance(d, list):
            raise ValueError("each disjunction must be a non-empty list of atoms")
        disjunctions.append(tuple(atom_from_json(a) for a in d))
    exclude = obj.get("exclude", [])
    if not isinstance(exclude, list):
        raise ValueError("'exclude' must be a list of atoms")
    exclusions = tuple(atom_from_json(a) for a in exclude)
    try:
        return CohortQuery(disjunctions=tuple(disjunctions), exclusions=exclusions)
    except TypeError as exc:  # dataclass arity/shape errors -> 400, not 500
        raise ValueError(f"malformed cohort query: {exc}") from None


def hal_page(
    rows: list,
    base_href: str,
    page_size: int,
    after: Any | None = None,
    next_token: Any | None = None,
) -> dict[str, Any]:
    """Render one paginated page as a HAL hypermedia document — the wire
    shape the reference's Liberator resources serve (``_links`` with
    self/next/first hrefs, ``_embedded`` items; public repo
    src/lens/handler.clj + util.clj hypermedia helpers; /root/reference
    empty, SURVEY.md §0). The ``next`` link carries the keyset
    continuation token from :func:`paginate`, so a client walks the
    collection purely by following links — no offset arithmetic
    client-side, no OFFSET scans server-side.
    """
    from urllib.parse import urlencode

    def href(tok: Any | None) -> str:
        params: dict[str, Any] = {"page-size": page_size}
        if tok is not None:
            params["after"] = tok
        return f"{base_href}?{urlencode(params)}"

    links: dict[str, Any] = {
        "self": {"href": href(after)},
        "first": {"href": href(None)},
    }
    if next_token is not None:
        links["next"] = {"href": href(next_token)}
    return {
        "_links": links,
        "_embedded": {
            "items": [r.asDict() if hasattr(r, "asDict") else dict(r) for r in rows]
        },
        "count": len(rows),
    }


def paginate_hal(
    df: DataFrame,
    key_col: str,
    page_size: int,
    base_href: str,
    after: Any | None = None,
) -> dict[str, Any]:
    """EP-2 end-to-end: one keyset page rendered as a HAL document."""
    rows, next_token = paginate(df, key_col, page_size, after)
    return hal_page(rows, base_href, page_size, after, next_token)


def paginate(
    df: DataFrame,
    key_col: str,
    page_size: int,
    after: Any | None = None,
) -> tuple[list, Any | None]:
    """Keyset pagination (EP-2): one page of rows ordered by ``key_col``
    strictly after ``after``, plus the next-page token (or None at end).

    Keyset beats OFFSET at scale: the predicate pushes into the scan, so
    page N costs the same as page 1 instead of skipping N*page_size rows.

    CONTRACT: ``key_col`` must be UNIQUE and NON-NULL (a primary key).
    The strictly-greater continuation filter silently skips any rows
    sharing the last-served key, and a NULL key cannot be encoded in
    the token — both are rejected loudly rather than dropped.
    """
    if page_size <= 0:
        raise ValueError(f"page_size must be positive, got {page_size}")
    q = df
    if after is not None:
        q = q.filter(F.col(key_col) > F.lit(after))
    rows = q.orderBy(key_col).limit(page_size + 1).collect()
    page = rows[:page_size]
    if len(rows) > page_size:
        next_token = page[-1][key_col]
        if next_token is None:
            raise ValueError(
                f"paginate requires non-null {key_col!r} values: a NULL in "
                "the token slot would silently end pagination early"
            )
    else:
        next_token = None
    return page, next_token


# ---------------------------------------------------------------------------
# Transit-JSON decoding (EP-1's actual wire encoding). The reference's
# Liberator resources render and parse transit+json (public repo
# src/lens/handler.clj; format spec: cognitect/transit-format, public).
# This is the minimal decoder the cohort CNF needs — keywords, strings,
# ints/doubles/bools/nil, arrays, maps (["^ ", k, v, ...] array form
# and verbose JSON-object form), and the writer's key/keyword cache
# ("^0".."^9", two-char "^NN" codes, base 44) — not a general transit
# library. Tagged values outside this subset raise rather than
# mis-decode.
# ---------------------------------------------------------------------------
_CACHE_BASE = 44
_CACHE_OFFSET = 48  # '0'


def _transit_decode_str(s: str, cache: list[str], as_map_key: bool):
    if s.startswith("^") and s != "^ ":
        # A cache ref is EXACTLY "^C" or "^CC" with C in the base-44
        # digit range [0-9A-Za-z...] (codepoints 48..48+44). Anything
        # else must raise, never mis-decode: a longer string would
        # silently drop its tail, and an out-of-range char would
        # produce a NEGATIVE index that python happily resolves to the
        # wrong cache entry (found by the round-5 fuzz).
        digits = s[1:]
        if len(digits) not in (1, 2) or any(
            not (0 <= ord(c) - _CACHE_OFFSET < _CACHE_BASE) for c in digits
        ):
            raise ValueError(f"malformed transit cache code {s!r}")
        idx = 0
        for c in digits:
            idx = idx * _CACHE_BASE + (ord(c) - _CACHE_OFFSET)
        try:
            return cache[idx]
        except IndexError:
            raise ValueError(f"transit cache code {s!r} out of range") from None
    cacheable = len(s) > 3 and (
        as_map_key or s[:2] in ("~:", "~$", "~#")
    )
    if s.startswith("~"):
        # A bare "~" has no tag byte: s[1] would IndexError, and the
        # contract (totality fuzz) is ValueError on any malformed input.
        if len(s) < 2:
            raise ValueError(f"malformed transit string {s!r}")
        tag, rest = s[1], s[2:]
        if tag == "~":
            out: object = "~" + rest
        elif tag == "^":
            out = "^" + rest
        elif tag == ":":  # keyword -> plain name, matching the JSON wire
            out = rest
        elif tag == "$":  # symbol -> string
            out = rest
        elif tag == "i":
            out = int(rest)
        elif tag == "d":
            out = float(rest)
        elif tag == "?":
            if rest not in ("t", "f"):
                raise ValueError(f"malformed transit bool {s!r}")
            out = rest == "t"
        elif tag == "_":
            out = None
        elif tag == "t":  # ISO-8601 instant -> string passthrough
            out = rest
        else:
            raise ValueError(f"unsupported transit tag in {s!r}")
    else:
        out = s
    if cacheable:
        # Spec behavior: the writer CLEARS its cache when full (44*44
        # entries) and restarts codes at ^0 — a decoder that keeps
        # appending resolves post-reset refs against the stale cache
        # and silently returns the wrong value on large payloads.
        if len(cache) >= _CACHE_BASE * _CACHE_BASE:
            cache.clear()
        cache.append(out)  # decoded form; later "^N" refs resolve to it
    return out


def _transit_decode(x, cache: list[str], as_map_key: bool = False):
    if isinstance(x, str):
        return _transit_decode_str(x, cache, as_map_key)
    if isinstance(x, list):
        if x and x[0] == "^ ":
            if len(x) % 2 != 1:
                raise ValueError("transit map-as-array has odd entry count")
            out = {}
            for i in range(1, len(x), 2):
                k = _transit_decode(x[i], cache, as_map_key=True)
                if isinstance(k, (list, dict)):
                    # unhashable decoded key would TypeError out of the
                    # malformed->ValueError contract (composite keys are
                    # outside this decoder's declared subset anyway)
                    raise ValueError("transit map key decodes to a non-scalar")
                out[k] = _transit_decode(x[i + 1], cache)
            return out
        return [_transit_decode(v, cache) for v in x]
    if isinstance(x, dict):  # verbose mode
        out = {}
        for k, v in x.items():
            dk = _transit_decode(k, cache, as_map_key=True)
            if isinstance(dk, (list, dict)):
                raise ValueError("transit map key decodes to a non-scalar")
            out[dk] = _transit_decode(v, cache)
        return out
    return x  # JSON scalar (int/float/bool/None)


def transit_parse(text: str):
    """Decode a transit+json document to plain Python structures.
    Keywords decode to their bare names, so a transit-encoded cohort
    CNF decodes to exactly the JSON wire shape ``cohort_from_json``
    already accepts."""
    import json

    try:
        return _transit_decode(json.loads(text), cache=[])
    except RecursionError:
        # A pathologically nested document ('[[[[...' a few thousand
        # deep) exhausts the Python stack inside _transit_decode;
        # json.loads survives (its C scanner has a higher ceiling), so
        # without this the wire contract (malformed -> ValueError ->
        # 400) leaks a RecursionError 500. Found in the round-7
        # adversarial pass over the decode paths.
        raise ValueError("transit document nested too deeply") from None


def cohort_from_transit(text: str) -> CohortQuery:
    """EP-1 with the reference's actual encoding: transit+json in,
    CohortQuery out (content negotiation's application/transit+json
    branch; the JSON branch is ``cohort_from_json``)."""
    obj = transit_parse(text)
    if not isinstance(obj, dict):
        raise ValueError("transit cohort payload must decode to a map")
    return cohort_from_json(obj)
