"""Change capture: git refs -> DiffEntry feed (SURVEY §2.9 T1).

Mirrors the reference's extractDiff behavior (src/diff/extractDiff.ts:22-150):
file-level A/D/M, record-wise diff of multi-record YAML by slug, skip of
M entries whose indexed fields are unchanged, rename -> D + A.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

from staticql_spark.config import resolve_config
from staticql_spark.diff import extract_diff

from conftest import CONFIG


def _git(repo, *args):
    subprocess.run(
        ["git", "-C", str(repo), *args],
        check=True,
        capture_output=True,
        env={
            "GIT_AUTHOR_NAME": "t",
            "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t",
            "GIT_COMMITTER_EMAIL": "t@t",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
        },
    )


@pytest.fixture()
def git_content(content_dir, tmp_path):
    repo = tmp_path / "repo"
    shutil.copytree(content_dir, repo)
    _git(repo, "init", "-q")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "base")
    return repo


def test_extract_diff_record_level(git_content):
    repo = git_content
    herbs = repo / "content" / "herbs"

    # M with an indexed field changed (name) -> kept
    p = herbs / "arctium-lappa.md"
    p.write_text(p.read_text().replace("name: ゴボウ", "name: 牛蒡"), encoding="utf-8")

    # M touching only a non-indexed field (overview) -> skipped
    p = herbs / "centella-asiatica.md"
    p.write_text(p.read_text().replace("ゴツゴラの概要", "改定"), encoding="utf-8")

    # multi-record YAML: one record added, one deleted, rest untouched
    tags = repo / "content" / "tags.yaml"
    tags.write_text(tags.read_text() + "- slug: sleep\n  name: 睡眠\n", encoding="utf-8")
    comp = repo / "content" / "compounds.yaml"
    comp.write_text(
        comp.read_text().replace("- slug: geraniol\n  name: ゲラニオール\n", ""),
        encoding="utf-8",
    )

    # rename -> D old slug + A new slug
    (herbs / "cymbopogon-citratus.md").rename(herbs / "lemongrass.md")

    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "edit")

    entries = extract_diff(str(repo), "HEAD~1", "HEAD", resolve_config(CONFIG))
    got = {(e["status"], e["source"], e["slug"]) for e in entries}

    assert ("M", "herbs", "arctium-lappa") in got
    assert not any(e["slug"] == "centella-asiatica" for e in entries)
    assert ("A", "tags", "sleep") in got
    assert not any(s == "tags" and sl != "sleep" for _st, s, sl in got)
    assert ("D", "compounds", "geraniol") in got
    assert ("D", "herbs", "cymbopogon-citratus") in got
    assert ("A", "herbs", "lemongrass") in got
    # nothing else leaked in
    assert len(got) == 5


def test_github_provider_mocked_api():
    # canned GitHub API responses: same DiffEntry contract as the git CLI
    # provider, no network (reference: src/diff/providers/github.ts:27-71)
    import json as _json

    from staticql_spark.diff import GitHubDiffProvider, extract_diff_with_provider

    herb_old = "---\nname: old name\ntags: [roots]\n---\nbody"
    herb_new = "---\nname: new name\ntags: [roots]\n---\nbody"
    added = "---\nname: fresh\ntags: [leaves]\n---\nnew herb"
    compare = {
        "files": [
            {"status": "modified", "filename": "content/herbs/arctium-lappa.md"},
            {"status": "added", "filename": "content/herbs/mentha-piperita.md"},
            {"status": "removed", "filename": "content/herbs/cymbopogon-citratus.md"},
            {
                "status": "renamed",
                "filename": "content/herbs/lemongrass.md",
                "previous_filename": "content/herbs/old-lemongrass.md",
            },
            {"status": "modified", "filename": "README.md"},  # no source match
        ]
    }

    def fake_fetch(url, headers):
        assert headers["Authorization"] == "token tok123"
        if "/compare/main...feat" in url:
            assert headers["Accept"] == "application/vnd.github.v3+json"
            return 200, _json.dumps(compare).encode()
        assert headers["Accept"] == "application/vnd.github.v3.raw"
        ref = url.rsplit("?ref=", 1)[1]
        if "arctium-lappa" in url:
            return 200, (herb_old if ref == "main" else herb_new).encode()
        if "mentha-piperita" in url:
            return (404, b"") if ref == "main" else (200, added.encode())
        if "cymbopogon-citratus" in url:
            return (200, herb_old.encode()) if ref == "main" else (404, b"")
        if "old-lemongrass" in url:
            return (200, herb_old.encode()) if ref == "main" else (404, b"")
        if "lemongrass" in url:
            return (404, b"") if ref == "main" else (200, herb_new.encode())
        return 404, b""

    provider = GitHubDiffProvider("acme/site", token="tok123", fetch=fake_fetch)
    entries = extract_diff_with_provider(
        provider, "main", "feat", resolve_config(CONFIG)
    )
    got = {(e["status"], e["source"], e["slug"]) for e in entries}
    # renamed decomposes into D(previous_filename) + A(filename), matching
    # GitCliProvider; README matches no source pattern
    assert got == {
        ("M", "herbs", "arctium-lappa"),
        ("A", "herbs", "mentha-piperita"),
        ("D", "herbs", "cymbopogon-citratus"),
        ("D", "herbs", "old-lemongrass"),
        ("A", "herbs", "lemongrass"),
    }


def test_github_provider_api_error_raises():
    from staticql_spark.diff import GitHubDiffProvider

    provider = GitHubDiffProvider(
        "acme/site", fetch=lambda u, h: (403, b'{"message": "rate limited"}')
    )
    with pytest.raises(RuntimeError, match="rate limited"):
        provider.diff_lines("a", "b")
