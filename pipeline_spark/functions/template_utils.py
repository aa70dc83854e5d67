"""Template helper namespace: the ``utils.*`` objects every reference
template can call.

Reference: util/TemplateUtil.java:24-382 — ``utils.string``
(format/reverse), ``utils.datetime`` (currentTimestamp with plus/truncate,
formatTimestamp, currentDate, year/month/day), ``utils.bigtable``
(reverseTimestampMicros/Millis for reverse-chronological row keys).
Injected as a global into config templating (config.render_template) and
row templating (compilers/select_fns text render), mirroring
TemplateUtil.setFunctions.

Timestamps render as ISO-8601 UTC strings (Java ``Instant.toString``
shape), which the reference's DateTimeUtil parser — and ours — accept.
"""

from __future__ import annotations

import datetime as dt

_CHRONO_SECONDS = {
    "NANOS": 1e-9, "MICROS": 1e-6, "MILLIS": 1e-3, "SECONDS": 1,
    "MINUTES": 60, "HOURS": 3600, "HALF_DAYS": 43200, "DAYS": 86400,
}


def _iso(instant: dt.datetime) -> str:
    instant = instant.astimezone(dt.timezone.utc)
    if instant.microsecond:
        return instant.strftime("%Y-%m-%dT%H:%M:%S.%f").rstrip("0") + "Z"
    return instant.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse(value) -> dt.datetime:
    if isinstance(value, dt.datetime):
        return value if value.tzinfo else value.replace(tzinfo=dt.timezone.utc)
    if isinstance(value, (int, float)):  # epoch micros (reference convention)
        return dt.datetime.fromtimestamp(value / 1e6, tz=dt.timezone.utc)
    return dt.datetime.fromisoformat(str(value).replace("Z", "+00:00"))


class StringFunctions:
    def format(self, fmt: str, *args) -> str:
        # Java String.format → %-style formatting works for the shared subset
        return fmt % args

    def reverse(self, text: str | None) -> str:
        return "" if text is None else text[::-1]


class DateTimeFunctions:
    def currentTimestamp(self, *args) -> str:
        """Overloads per TemplateUtil.java:284-313: (), (plusSeconds),
        (plusAmount, unit), (truncateUnit), (plusAmount, unit, truncateUnit)."""
        plus_amount = unit = truncate = None
        if len(args) == 1:
            if isinstance(args[0], str):
                truncate = args[0]
            else:
                plus_amount, unit = args[0], "SECONDS"
        elif len(args) == 2:
            plus_amount, unit = args
        elif len(args) == 3:
            plus_amount, unit, truncate = args
        now = dt.datetime.now(dt.timezone.utc)
        if plus_amount is not None:
            now += dt.timedelta(seconds=float(plus_amount) * _CHRONO_SECONDS[str(unit).upper()])
        if truncate is not None:
            step = _CHRONO_SECONDS[str(truncate).upper()]
            epoch = now.timestamp()
            now = dt.datetime.fromtimestamp(epoch - (epoch % step), tz=dt.timezone.utc)
        return _iso(now)

    def currentDate(self, *args) -> str:
        return self.currentTimestamp(*args)[:10]

    def formatTimestamp(self, timestamp, pattern: str | None = None,
                        timezone: str | None = None) -> str:
        instant = _parse(timestamp)
        if timezone:
            import zoneinfo

            instant = instant.astimezone(zoneinfo.ZoneInfo(timezone))
        if pattern is None:
            return _iso(instant)
        # Java DateTimeFormatter pattern subset → strftime
        py = (pattern
              .replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d")
              .replace("HH", "%H").replace("mm", "%M").replace("ss", "%S"))
        return instant.strftime(py)

    def _local(self, timestamp, timezone):
        instant = _parse(timestamp)
        if timezone:
            import zoneinfo

            return instant.astimezone(zoneinfo.ZoneInfo(timezone))
        return instant.astimezone(dt.timezone.utc)

    def year(self, timestamp, timezone=None) -> str:
        return "" if timestamp is None else str(self._local(timestamp, timezone).year)

    def month(self, timestamp, timezone=None, padding=None) -> str:
        if timestamp is None:
            return ""
        m = self._local(timestamp, timezone).month
        return f"{m:0{padding}d}" if padding else str(m)

    def day(self, timestamp, timezone=None, padding=None) -> str:
        if timestamp is None:
            return ""
        d = self._local(timestamp, timezone).day
        return f"{d:0{padding}d}" if padding else str(d)

    def hour(self, timestamp, timezone=None, padding=None) -> str:
        if timestamp is None:
            return ""
        h = self._local(timestamp, timezone).hour
        return f"{h:0{padding}d}" if padding else str(h)


class BigtableFunctions:
    _LONG_MAX = (1 << 63) - 1

    def reverseTimestampMicros(self, value) -> int:
        if not isinstance(value, (int, float)):
            value = _parse(value).timestamp() * 1e6
        return self._LONG_MAX - int(value)

    def reverseTimestampMillis(self, value) -> int:
        if not isinstance(value, (int, float)):
            value = _parse(value).timestamp() * 1e3
        return self._LONG_MAX // 1000 - int(value)


UTILS = {
    "string": StringFunctions(),
    "datetime": DateTimeFunctions(),
    "bigtable": BigtableFunctions(),
}
