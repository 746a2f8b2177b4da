"""Archive key listing adapters: where the catalog's keys come from.

The reference builds its inventory from a driver-side paginated S3 listing
(``app/services/get_options.py:103`` — boto3 ``list_objects_v2`` pages).
The engine keeps that boundary behind a tiny interface so the *production*
wiring is a constructor argument, not a rewrite:

- :class:`ParquetKeyLister` — reads a staged ``archive_keys.parquet``
  (this sandbox's stand-in, written by ``sources.domain.materialize_domain``).
- :class:`PaginatedKeyLister` — drives any ``(prefix, token) ->
  (keys, next_token)`` pager to exhaustion, then hands the keys to
  ``catalog.keys_from_listing``. :func:`s3_pager` adapts a boto3-style
  client's public ``list_objects_v2`` shape to that pager signature without
  importing any SDK (the client is injected, so tests use a fake).

Scale note: the listing is bounded by archive *file* count (one file per
hydrophone-product-month — thousands of keys at 100 TB of data), so a
driver-side listing loop matches the reference's behavior and is never the
bottleneck; the result feeds ``build_catalog``, which is broadcast-sized by
construction.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from .catalog import keys_from_listing

# (prefix, continuation_token) -> (keys_in_page, next_token_or_None)
Pager = Callable[[str, "str | None"], "tuple[list[str], str | None]"]


class ParquetKeyLister:
    """Keys from a staged single-column parquet file (sandbox default)."""

    def __init__(self, path: str):
        self.path = path

    def list_keys(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path).select("key")


class PaginatedKeyLister:
    """Keys from a paginated object listing (the production S1 edge).

    ``pager`` is called per prefix with a continuation token (``None``
    first) and must return ``(keys, next_token)``; ``None`` ends that
    prefix. ``max_pages`` bounds runaway pagination (a pager that never
    returns ``None`` fails loudly instead of looping forever).
    """

    def __init__(
        self,
        pager: Pager,
        prefixes: Iterable[str] = ("",),
        max_pages: int = 10_000,
    ):
        self.pager = pager
        self.prefixes = list(prefixes)
        self.max_pages = max_pages

    def list_keys(self, spark: SparkSession) -> DataFrame:
        keys: list[str] = []
        for prefix in self.prefixes:
            token: str | None = None
            for _ in range(self.max_pages):
                page, token = self.pager(prefix, token)
                keys.extend(page)
                if token is None:
                    break
            else:
                raise RuntimeError(
                    f"listing for prefix {prefix!r} exceeded "
                    f"{self.max_pages} pages without completing"
                )
        return keys_from_listing(spark, keys)


def s3_pager(client, bucket: str) -> Pager:
    """Adapt a boto3-style client (public ``list_objects_v2`` call shape:
    Bucket/Prefix/ContinuationToken → Contents/IsTruncated/
    NextContinuationToken) to the :class:`PaginatedKeyLister` pager
    signature. The client is injected — no SDK import here, so the sandbox
    tests drive this with a fake and production passes the real client."""

    def page(prefix: str, token: "str | None"):
        kwargs = {"Bucket": bucket, "Prefix": prefix}
        if token is not None:
            kwargs["ContinuationToken"] = token
        resp = client.list_objects_v2(**kwargs)
        keys = [o["Key"] for o in resp.get("Contents", [])]
        next_token = (
            resp.get("NextContinuationToken")
            if resp.get("IsTruncated")
            else None
        )
        return keys, next_token

    return page
