"""Change capture: two git refs -> DiffEntry records (§2.9 T1).

Parity with the reference's extractDiff (src/diff/extractDiff.ts:22-150):
- file-level A/D/M from ``git diff --name-status ref1 ref2``
- files that hold MULTIPLE records (YAML/JSON lists) are diffed
  record-wise by slug: a record present only in the new version is A,
  only in the old is D, changed is M (:137-149)
- M entries whose *indexed* fields are all unchanged are skipped
  (:124-129) — they cannot affect any index artifact
- renamed files (R status) decompose into D + A

Providers: git CLI here (src/diff/providers/git.ts); the GitHub-API and fs
providers of the reference are storage variants of the same contract and
are intentionally out of scope (no network in this engine's profile).

The output is a plain list of dicts (one per record-level change) that
``spark.createDataFrame(entries, DIFF_SCHEMA)`` turns into the changes
DataFrame consumed by streaming.apply_diff / refresh_index_partitions.
"""

from __future__ import annotations

import subprocess

from .config import SourceConfig
from .functions import glob_base_and_regex, path_to_slug
from .sources.parsers import parse_by_type


def _git_show(repo_dir: str, ref: str, path: str) -> str | None:
    res = subprocess.run(
        ["git", "-C", repo_dir, "show", f"{ref}:{path}"],
        capture_output=True,
        text=True,
    )
    return res.stdout if res.returncode == 0 else None


def _match_source(path: str, configs: dict[str, SourceConfig]) -> tuple[str, str] | None:
    """(source_name, rel_path_under_glob_base) for the config whose glob
    matches ``path``, else None."""
    for name, cfg in configs.items():
        if cfg.type == "parquet" or not cfg.pattern:
            continue
        base, rx = glob_base_and_regex(cfg.pattern)
        if path == base:  # wildcard-free pattern: the file itself
            return name, ""
        prefix = base + "/" if base else ""
        if path.startswith(prefix) and rx.match(path[len(prefix):]):
            return name, path[len(prefix):]
    return None


def _records_by_slug(cfg: SourceConfig, rel_path: str, raw: str | None) -> dict[str, dict]:
    if raw is None:
        return {}
    parsed = parse_by_type(cfg.type, raw)
    if isinstance(parsed, list):
        return {str(r["slug"]): r for r in parsed if r.get("slug") is not None}
    return {path_to_slug(rel_path): parsed}


def _indexed_view(cfg: SourceConfig, rec: dict) -> dict:
    """Projection of a record to its indexed fields (for the skip-unchanged
    check). Relation-path indexes can't be evaluated file-locally — any
    change keeps the record conservatively."""
    out = {}
    for f in cfg.index_fields:
        if "." in f and f.split(".", 1)[0] in cfg.relations:
            continue
        out[f] = rec.get(f.split(".", 1)[0]) if "." in f else rec.get(f)
    return out


def extract_diff(
    repo_dir: str,
    ref1: str,
    ref2: str,
    configs: dict[str, SourceConfig],
) -> list[dict]:
    """DiffEntry list [{status, source, slug}] between two refs."""
    res = subprocess.run(
        ["git", "-C", repo_dir, "diff", "--name-status", ref1, ref2],
        capture_output=True,
        text=True,
        check=True,
    )
    entries: list[dict] = []
    for line in res.stdout.splitlines():
        parts = line.split("\t")
        if not parts or not parts[0]:
            continue
        status = parts[0][0]
        if status == "R" and len(parts) == 3:
            changes = [("D", parts[1]), ("A", parts[2])]
        elif status in ("A", "D", "M"):
            changes = [(status, parts[1])]
        else:
            continue

        for st, path in changes:
            hit = _match_source(path, configs)
            if hit is None:
                continue
            source, rel = hit
            cfg = configs[source]
            old = _records_by_slug(cfg, rel, _git_show(repo_dir, ref1, path))
            new = _records_by_slug(cfg, rel, _git_show(repo_dir, ref2, path))
            if st == "A":
                for slug in new:
                    entries.append({"status": "A", "source": source, "slug": slug})
            elif st == "D":
                for slug in old:
                    entries.append({"status": "D", "source": source, "slug": slug})
            else:  # M: record-wise diff by slug
                for slug in new.keys() - old.keys():
                    entries.append({"status": "A", "source": source, "slug": slug})
                for slug in old.keys() - new.keys():
                    entries.append({"status": "D", "source": source, "slug": slug})
                for slug in new.keys() & old.keys():
                    if _indexed_view(cfg, old[slug]) != _indexed_view(cfg, new[slug]):
                        entries.append({"status": "M", "source": source, "slug": slug})
    return entries
