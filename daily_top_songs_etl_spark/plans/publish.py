"""K7: git-commit publication of the daily artifacts.

The reference publishes its outputs by committing them back to the repo
from the scheduled workflow (``.github/workflows/etl.yml``): the CSV
mirrors right after the ETL run (``:41-45`` — ``git add db/csv`` +
``chore(automated): add fetched daily data to csvs``), then the rendered
README after the report step (``:57-79`` — a ``git pull --rebase`` first,
then ``chore(automated): update readme with daily data``), both pushed
with a token remote.

Re-expressed here as a plain operator over a working tree: stage the
given paths, commit with the reference's exact message, optionally
rebase-pull and push. The push/remote half is network-edge and gated
behind ``remote=None`` (offline environments and all tests publish into
a local repository only) — the same offline-first split as
``sources/ingest.fetch_url``. Publication is idempotent by construction:
when the staged paths carry no changes the commit is skipped and the
previous head is returned, matching the workflow's behavior on a no-op
day.
"""

from __future__ import annotations

import subprocess

#: The reference's exact commit messages (etl.yml:44, :78).
CSV_COMMIT_MESSAGE = "chore(automated): add fetched daily data to csvs"
README_COMMIT_MESSAGE = "chore(automated): update readme with daily data"


def _git(repo_dir: str, *args: str) -> str:
    out = subprocess.run(
        ["git", "-C", repo_dir, *args],
        capture_output=True,
        text=True,
        check=True,
    )
    return out.stdout.strip()


def publish_to_git(
    repo_dir: str,
    paths: list[str],
    message: str,
    author_name: str = "js",
    author_email: str = "js@users.noreply.example",
    remote: str | None = None,
    branch: str = "master",
    rebase_first: bool = False,
) -> str:
    """Stage ``paths``, commit with ``message``; returns the head sha.

    If the staged paths contain no changes, no commit is created and the
    current head sha is returned (a scheduled run on an unchanged day
    must not manufacture empty commits). ``remote`` (a URL or remote
    name) enables the network half — ``git pull --rebase`` when
    ``rebase_first`` (the README step races the CSV step in the
    reference's workflow, etl.yml:59) and a push after the commit.

    Ordering matters: the local commit is created BEFORE the rebase-pull.
    The reference workflow pulls on a clean checkout before rendering; here
    the rendered README is already a modification to a tracked file, and
    ``git pull --rebase`` refuses to run over unstaged changes to tracked
    paths (exit 128, "cannot pull with rebase: You have unstaged
    changes"). Committing first gives the rebase a clean tree and replays
    the publication commit on top of the remote head — the same final
    content as the reference's pull-then-commit on its clean runner.
    ``rebase.autostash`` additionally shields the pull from unrelated
    dirty files outside ``paths``.
    """
    _git(repo_dir, "add", "--", *paths)
    staged = _git(repo_dir, "diff", "--cached", "--name-only")
    if staged:
        _git(
            repo_dir,
            "-c",
            f"user.name={author_name}",
            "-c",
            f"user.email={author_email}",
            "commit",
            "-m",
            message,
        )
    if remote is not None:
        if rebase_first:
            # replaying the commit during rebase needs a committer identity
            _git(
                repo_dir,
                "-c",
                f"user.name={author_name}",
                "-c",
                f"user.email={author_email}",
                "-c",
                "rebase.autostash=true",
                "pull",
                "--rebase",
                remote,
                branch,
            )
        if staged:
            _git(repo_dir, "push", remote, branch)
    return _git(repo_dir, "rev-parse", "HEAD")


def publish_csv_mirrors(repo_dir: str, csv_dir: str = "db/csv", **kw) -> str:
    """The workflow's first publication step (etl.yml:43-45)."""
    return publish_to_git(repo_dir, [csv_dir], CSV_COMMIT_MESSAGE, **kw)


def publish_readme(repo_dir: str, readme: str = "README.md", **kw) -> str:
    """The workflow's second publication step (etl.yml:59, 77-79)."""
    return publish_to_git(
        repo_dir, [readme], README_COMMIT_MESSAGE, rebase_first=True, **kw
    )
