"""Iceberg REST catalog client (stdlib HTTP, no runtime jar).

The REST catalog protocol is a public OpenAPI spec
(apache/iceberg: open-api/rest-catalog-open-api.yaml).  Managed-catalog
tables (reference: module/source/IcebergSource.java:20-108 reads them
through the vendor runtime) resolve here natively:

  GET  {uri}/v1/config?warehouse=...     → defaults/overrides (+prefix)
  POST {uri}/v1/oauth/tokens             → client-credentials bearer token
  GET  {uri}/v1/{prefix}/namespaces/{ns}/tables/{name}
       → LoadTableResult {"metadata-location", "metadata", "config"}

The returned ``metadata`` IS the table-metadata JSON the filesystem
reader already consumes (sources/iceberg_native.py ``plan_files``), and
every manifest/data path inside it is absolute per the spec — so the
catalog client only replaces the ``<table>/metadata`` directory walk,
nothing downstream changes.  When a server returns only
``metadata-location`` (allowed by the spec), the JSON is fetched from
that location (http(s) or filesystem).

Writes through a REST catalog need the commit protocol (optimistic
requirements/updates) — gated with an actionable error at the sink.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Any


def _http_json(
    url: str,
    *,
    method: str = "GET",
    body: dict | None = None,
    form: dict | None = None,
    headers: dict | None = None,
    timeout: float = 30.0,
    opener=None,
) -> dict:
    hdrs = {"Accept": "application/json", **(headers or {})}
    data = None
    if form is not None:
        data = urllib.parse.urlencode(form).encode()
        hdrs["Content-Type"] = "application/x-www-form-urlencoded"
    elif body is not None:
        data = json.dumps(body).encode()
        hdrs["Content-Type"] = "application/json"
    req = urllib.request.Request(url, data=data, headers=hdrs, method=method)
    open_fn = opener.open if opener is not None else urllib.request.urlopen
    with open_fn(req, timeout=timeout) as resp:
        payload = resp.read()
    return json.loads(payload) if payload else {}


class CommitConflictError(RuntimeError):
    """A CommitTableRequest lost the optimistic race (HTTP 409): another
    writer advanced the table.  Callers with a provably-disjoint
    read/write set reload metadata and retry; true conflicts re-raise."""


class RestCatalog:
    """Minimal read-path REST catalog session.

    ``props``: {"uri": ..., "warehouse"?, "token"?, "credential"?
    ("client_id:client_secret" → OAuth2 client-credentials), "prefix"?,
    "scope"?}.  ``opener`` injects a urllib opener for tests.
    """

    def __init__(self, props: dict[str, Any], opener=None):
        uri = str(props.get("uri") or "").rstrip("/")
        if not uri:
            raise ValueError("iceberg rest catalog: 'uri' is required")
        self.uri = uri
        self.opener = opener
        self.headers: dict[str, str] = {}
        token = props.get("token")
        cred = props.get("credential")
        if not token and cred:
            cid, _, secret = str(cred).partition(":")
            tok = _http_json(
                f"{uri}/v1/oauth/tokens",
                method="POST",
                form={
                    "grant_type": "client_credentials",
                    "client_id": cid,
                    "client_secret": secret,
                    "scope": str(props.get("scope", "catalog")),
                },
                opener=opener,
            )
            token = tok.get("access_token")
        if token:
            self.headers["Authorization"] = f"Bearer {token}"
        # config endpoint: server merges defaults <- client <- overrides
        q = ""
        if props.get("warehouse"):
            q = "?" + urllib.parse.urlencode({"warehouse": props["warehouse"]})
        try:
            cfg = _http_json(
                f"{uri}/v1/config{q}", headers=self.headers, opener=opener
            )
        except Exception as exc:  # config is optional on some servers
            if props.get("prefix") is None:
                raise ValueError(
                    f"iceberg rest catalog: GET {uri}/v1/config failed "
                    f"({exc}) and no explicit 'prefix' was given"
                ) from exc
            cfg = {}
        merged = {
            **(cfg.get("defaults") or {}),
            **{k: v for k, v in props.items() if k not in ("uri",)},
            **(cfg.get("overrides") or {}),
        }
        self.prefix = str(merged.get("prefix", "") or "")

    def _route(self, tail: str) -> str:
        base = f"{self.uri}/v1"
        if self.prefix:
            # the prefix is a PATH FRAGMENT the server handed back (may be
            # multi-segment, e.g. "ws/12345") — encode per segment, keep
            # the slashes, exactly like the reference Java client
            base += "/" + urllib.parse.quote(self.prefix, safe="/")
        return f"{base}/{tail}"

    def create_table(self, namespace: str, body: dict) -> dict:
        """POST CreateTableRequest → LoadTableResult metadata."""
        ns = urllib.parse.quote(namespace, safe="")
        result = _http_json(
            self._route(f"namespaces/{ns}/tables"),
            method="POST",
            body=body,
            headers=self.headers,
            opener=self.opener,
        )
        meta = result.get("metadata")
        if meta is None:
            raise ValueError(
                "iceberg rest catalog: create-table response carries no "
                "metadata"
            )
        return meta

    def commit_table(
        self,
        namespace: str,
        name: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        """POST CommitTableRequest (the optimistic-concurrency commit:
        the server validates ``requirements`` against its current
        metadata and applies ``updates`` atomically; a failed
        requirement is a conflict → retry with fresh metadata)."""
        ns = urllib.parse.quote(namespace, safe="")
        tbl = urllib.parse.quote(name, safe="")
        try:
            result = _http_json(
                self._route(f"namespaces/{ns}/tables/{tbl}"),
                method="POST",
                body={"requirements": requirements, "updates": updates},
                headers=self.headers,
                opener=self.opener,
            )
        except urllib.error.HTTPError as exc:
            if exc.code == 409:
                raise CommitConflictError(
                    "iceberg rest catalog: commit conflict — another "
                    "writer advanced the table; reload and retry the write"
                ) from exc
            raise
        return result.get("metadata") or {}

    def load_table(self, namespace: str, name: str) -> tuple[dict, str]:
        """(table metadata JSON, metadata location) for ``ns.table``."""
        ns = urllib.parse.quote(namespace, safe="")
        tbl = urllib.parse.quote(name, safe="")
        result = _http_json(
            self._route(f"namespaces/{ns}/tables/{tbl}"),
            headers=self.headers,
            opener=self.opener,
        )
        meta = result.get("metadata")
        loc = result.get("metadata-location") or ""
        if meta is None:
            if not loc:
                raise ValueError(
                    "iceberg rest catalog: LoadTableResult carries neither "
                    "metadata nor metadata-location"
                )
            if loc.startswith(("http://", "https://")):
                # only forward the catalog's bearer token to the CATALOG'S
                # own origin — a metadata-location on another host (e.g. a
                # presigned object-store URL) must not receive credentials
                same_origin = (
                    urllib.parse.urlsplit(loc)[:2]
                    == urllib.parse.urlsplit(self.uri)[:2]
                )
                meta = _http_json(
                    loc,
                    headers=self.headers if same_origin else {},
                    opener=self.opener,
                )
            else:
                path = loc[len("file://"):] if loc.startswith("file://") else loc
                with open(path) as fh:
                    meta = json.load(fh)
        return meta, loc


def load_rest_table(
    catalog: dict[str, Any], table: str, opener=None
) -> tuple[dict, str]:
    """Resolve ``namespace.table`` (dots nest namespaces with the spec's
    %1F separator) through a REST catalog config dict."""
    if not table:
        raise ValueError(
            "iceberg rest catalog: 'table' (\"namespace.table\") is required"
        )
    ns, _, name = str(table).rpartition(".")
    if not ns:
        raise ValueError(
            f"iceberg rest catalog: table '{table}' needs a namespace "
            "(\"namespace.table\")"
        )
    cat = RestCatalog(catalog, opener=opener)
    # multi-level namespaces join with the unit separator per the spec
    return cat.load_table(ns.replace(".", "\x1f"), name)
