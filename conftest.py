"""Repo-root conftest: puts the repo on sys.path for test imports."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
