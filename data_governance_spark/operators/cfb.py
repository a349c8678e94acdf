"""Compound File Binary (OLE2 / [MS-CFB]) reader — the container
under legacy Office binaries (.doc/.xls/.ppt), pure stdlib.

Only what document extraction needs: header validation, DIFAT → FAT,
the directory as a flat scan (the red-black sibling tree is an index,
not a membership structure — a linear walk sees every entry), the
mini-FAT / mini-stream for streams under the 4096-byte cutoff, and
bounds-checked chain walking with loop detection (a cyclic FAT chain
is a classic hostile-input hang).

Raises :class:`CfbError` (a ``ValueError``) for every malformed
structure — callers map it into their own typed taxonomy
(``operators/office.py`` wraps it as ``OfficeParseError``).
"""

from __future__ import annotations

import struct

__all__ = ["CfbError", "CfbFile"]

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_MAXREG = 0xFFFFFFFA


class CfbError(ValueError):
    """Malformed compound file."""


class CfbFile:
    """Parsed CFB container over in-memory bytes.

    ``streams()`` lists stream names; ``read(name)`` returns a
    stream's bytes (mini-stream or FAT-chained as its size demands).
    Names match case-insensitively on the final path component, the
    practical rule for Office containers where writers disagree on
    case."""

    def __init__(self, data: bytes):
        if not isinstance(data, (bytes, bytearray)):
            raise CfbError(f"expected bytes, got {type(data).__name__}")
        self.data = bytes(data)
        if len(self.data) < 512 or self.data[:8] != _MAGIC:
            raise CfbError("not a compound file")
        (
            self.sector_shift,
            self.mini_shift,
        ) = struct.unpack_from("<HH", self.data, 30)
        if self.sector_shift not in (9, 12) or self.mini_shift != 6:
            raise CfbError(
                f"bad sector shifts {self.sector_shift}/{self.mini_shift}"
            )
        self.ssz = 1 << self.sector_shift
        self.mssz = 1 << self.mini_shift
        (self.n_fat,) = struct.unpack_from("<I", self.data, 44)
        (self.dir_start,) = struct.unpack_from("<I", self.data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", self.data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", self.data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", self.data, 64)
        (self.difat_start,) = struct.unpack_from("<I", self.data, 68)
        (self.n_difat,) = struct.unpack_from("<I", self.data, 72)
        # every count below is bounded by the actual byte length — a
        # header can claim anything
        self.max_sect = max(0, (len(self.data) - self.ssz) // self.ssz + 1)
        self._fat = self._read_fat()
        self._dir = self._read_dir()
        self._minifat = self._read_minifat()
        self._ministream = self._root_ministream()

    # -- sectors ----------------------------------------------------
    def _sector(self, n: int) -> bytes:
        off = (n + 1) << self.sector_shift
        if n > _MAXREG or off + self.ssz > len(self.data) or n < 0:
            raise CfbError(f"sector {n} out of range")
        return self.data[off : off + self.ssz]

    def _read_fat(self) -> list[int]:
        per = self.ssz // 4
        fat_sectors: list[int] = []
        hdr = struct.unpack_from("<109I", self.data, 76)
        for s in hdr:
            if s <= _MAXREG:
                fat_sectors.append(s)
        # DIFAT chain for files with > 109 FAT sectors
        s = self.difat_start
        seen: set = set()
        while s <= _MAXREG:
            if s in seen or len(seen) > self.max_sect:
                raise CfbError("DIFAT chain cycle")
            seen.add(s)
            sec = self._sector(s)
            entries = struct.unpack_from(f"<{per}I", sec, 0)
            for e in entries[:-1]:
                if e <= _MAXREG:
                    fat_sectors.append(e)
            s = entries[-1]
        if len(fat_sectors) > self.max_sect:
            raise CfbError("FAT larger than the file")
        fat: list[int] = []
        for fs in fat_sectors:
            fat.extend(struct.unpack_from(f"<{per}I", self._sector(fs), 0))
        return fat

    def _chain(self, start: int, fat: list[int], limit: int) -> list[int]:
        out: list[int] = []
        s = start
        seen: set = set()
        while s <= _MAXREG:
            if s in seen or len(out) > limit:
                raise CfbError("sector chain cycle")
            seen.add(s)
            out.append(s)
            if s >= len(fat):
                raise CfbError(f"chain runs past FAT ({s})")
            s = fat[s]
        if s != _ENDOFCHAIN and s != _FREESECT:
            # reserved sentinel in a chain position
            raise CfbError(f"bad chain terminator {s:#x}")
        return out

    # -- directory ----------------------------------------------------
    def _read_dir(self) -> list[dict]:
        out: list[dict] = []
        for s in self._chain(self.dir_start, self._fat, self.max_sect):
            sec = self._sector(s)
            for off in range(0, self.ssz, 128):
                ent = sec[off : off + 128]
                (nlen,) = struct.unpack_from("<H", ent, 64)
                otype = ent[66]
                if otype == 0 or nlen < 2 or nlen > 64:
                    continue
                name = ent[: nlen - 2].decode("utf-16-le", errors="replace")
                (start,) = struct.unpack_from("<I", ent, 116)
                (size,) = struct.unpack_from("<Q", ent, 120)
                if self.sector_shift == 9:
                    size &= 0xFFFFFFFF  # v3 writers leave high bits dirty
                out.append(
                    {"name": name, "type": otype, "start": start,
                     "size": size}
                )
        if not out or out[0]["type"] != 5:
            raise CfbError("no root directory entry")
        return out

    def _read_minifat(self) -> list[int]:
        if self.minifat_start > _MAXREG:
            return []
        per = self.ssz // 4
        fat: list[int] = []
        for s in self._chain(self.minifat_start, self._fat, self.max_sect):
            fat.extend(struct.unpack_from(f"<{per}I", self._sector(s), 0))
        return fat

    def _root_ministream(self) -> bytes:
        root = self._dir[0]
        if root["start"] > _MAXREG or root["size"] == 0:
            return b""
        chunks = [
            self._sector(s)
            for s in self._chain(root["start"], self._fat, self.max_sect)
        ]
        return b"".join(chunks)[: root["size"]]

    # -- public -------------------------------------------------------
    def streams(self) -> list[str]:
        return [e["name"] for e in self._dir if e["type"] == 2]

    def _find(self, name: str) -> dict | None:
        low = name.lower()
        for e in self._dir:
            if e["type"] == 2 and e["name"].lower() == low:
                return e
        return None

    def has(self, name: str) -> bool:
        return self._find(name) is not None

    def read(self, name: str) -> bytes:
        e = self._find(name)
        if e is None:
            raise CfbError(f"no stream {name!r}")
        size = e["size"]
        if size > len(self.data) * 64:  # mini-sector worst case bound
            raise CfbError(f"stream {name!r} claims {size} bytes")
        if size < self.mini_cutoff:
            # mini-FAT chain over the root mini stream
            n_mini = max(1, len(self._ministream) // self.mssz + 1)
            chunks = []
            for ms in self._chain(e["start"], self._minifat, n_mini):
                off = ms * self.mssz
                if off >= len(self._ministream):
                    raise CfbError("mini sector out of range")
                chunks.append(self._ministream[off : off + self.mssz])
            body = b"".join(chunks)
        else:
            body = b"".join(
                self._sector(s)
                for s in self._chain(e["start"], self._fat, self.max_sect)
            )
        if len(body) < size:
            # a short chain under a bigger declared size is a lie —
            # truncating silently would hand callers partial documents
            raise CfbError(
                f"stream {name!r} chain yields {len(body)} < {size} bytes"
            )
        return body[:size]
