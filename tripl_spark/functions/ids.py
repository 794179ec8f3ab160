"""Deterministic entity ids, computable identically driver-side (Python
``uuid.uuid5``) and JVM-side (a Column expression reconstructing RFC
4122 v5 from ``md5``).

Why it matters: the driver-side flattener (small interactive writes)
and the distributed bulk ingester (``sources/json_bulk.py``) must mint
THE SAME eid for the same identifying fact, or the two write paths
would silently split entities. uuid5 is sha1(namespace_bytes || name)
truncated to 128 bits with version/variant bits patched — all of which
Spark can express with ``sha1``/``substring``/``conv``, so the JVM path
needs no Python at all.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

_NS = uuid.NAMESPACE_URL


def uuid5_py(name: str) -> str:
    return str(uuid.uuid5(_NS, name))


def uuid5_col(name: F.Column) -> F.Column:
    """RFC 4122 v5 UUID of ``name`` under NAMESPACE_URL, as a Column.

    sha1(ns_bytes || utf8(name)) truncated to 16 bytes (RFC 4122 §4.3 —
    v5 is SHA-1-based; v3 is the md5 one); patch the version nibble
    (char 13 → '5') and the variant nibble (char 17 → (d & 3) | 8);
    dash-format.
    """
    h = F.sha1(F.concat(F.lit(_NS.bytes), F.encode(name, "utf-8")))
    variant = F.lower(
        F.conv(
            (F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4 + 8).cast("string"),
            10,
            16,
        )
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def deterministic_eid_col(attr: str, value: F.Column) -> F.Column:
    """JVM twin of ``core.flatten.deterministic_eid`` — same
    ``"tripl:{attr}={value}"`` name, same namespace."""
    return uuid5_col(F.concat(F.lit(f"tripl:{attr}="), value.cast("string")))
