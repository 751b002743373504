"""Text analysis operators (Tier C): language-ID, quality scoring, token
counting, document fingerprinting.
"""

from __future__ import annotations
