"""Outbound data shares (SURVEY §2.1 S11, §2.10 G4, §2.11 V5).

Reference: ``CREATE SHARE trips_share`` + ``GRANT USAGE/SELECT ... TO
SHARE`` + ``ALTER SHARE ADD ACCOUNTS`` (dp_demo.sql:208-215, 242), with
``SHOW SHARES`` / ``DESC SHARE`` introspection (dp_demo.sql:210, 244,
259).

Spark has no cross-account zero-copy primitive, so a share here is a
*registry object*: named grants map object names to view factories
(callables returning a DataFrame built for a consumer account — e.g.
:func:`plans.secure_view.secure_trips_view` partials). A consumer
"mounting" the share calls :meth:`Share.open` with its account; the
factory bakes the account literal in, which is exactly how the
reference's ``current_account()``-governed secure view behaves across
a share boundary (dp_demo.sql:222-239, 263-275). GRANT/REVOKE carry no
enforcement (documented non-goal, SURVEY G4) — the registry records
them so SHOW/DESC parity is real.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame


class Share:
    """One outbound share: granted objects + authorized accounts."""

    def __init__(self, name: str):
        self.name = name
        self.created = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        #: object name -> factory(account) -> DataFrame
        self.grants: dict[str, Callable[[str], DataFrame]] = {}
        self.accounts: list[str] = []

    def grant(self, object_name: str,
              factory: Callable[[str], DataFrame]) -> None:
        """``GRANT SELECT ON <object> TO SHARE`` (dp_demo.sql:214-215)."""
        self.grants[object_name] = factory

    def revoke(self, object_name: str) -> None:
        self.grants.pop(object_name, None)

    def add_accounts(self, *accounts: str) -> None:
        """``ALTER SHARE ADD ACCOUNTS = ...`` (dp_demo.sql:242)."""
        for a in accounts:
            if a not in self.accounts:
                self.accounts.append(a)

    def open(self, object_name: str, account: str) -> DataFrame:
        """Consumer-side mount: build the granted view for ``account``.
        Raises KeyError on un-granted objects and PermissionError on
        un-authorized accounts (the reference's reader-account gate)."""
        if account not in self.accounts:
            raise PermissionError(
                f"account {account!r} is not authorized on share {self.name!r}"
            )
        return self.grants[object_name](account)

    def describe(self) -> list[dict]:
        """``DESC SHARE`` rows (dp_demo.sql:259 shape: kind, name)."""
        return [
            {"kind": "VIEW", "name": obj, "share": self.name}
            for obj in sorted(self.grants)
        ]


class ShareRegistry:
    """CREATE/SHOW/DESC SHARE surface."""

    def __init__(self) -> None:
        self.shares: dict[str, Share] = {}

    def create_share(self, name: str) -> Share:
        """``CREATE SHARE IF NOT EXISTS`` semantics (dp_demo.sql:208)."""
        if name not in self.shares:
            self.shares[name] = Share(name)
        return self.shares[name]

    def drop_share(self, name: str) -> None:
        self.shares.pop(name, None)

    def show(self) -> list[dict]:
        """``SHOW SHARES`` (dp_demo.sql:210, 244)."""
        return [
            {
                "name": s.name,
                "kind": "OUTBOUND",
                "to": list(s.accounts),
                "objects": len(s.grants),
                "created_on": s.created,
            }
            for s in self.shares.values()
        ]

    def describe(self, name: str) -> list[dict]:
        return self.shares[name].describe()
