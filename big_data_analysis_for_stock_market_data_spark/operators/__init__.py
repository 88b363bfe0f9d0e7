"""Engine operators (SURVEY.md §2 inventory + north-star extensions).

- ``windows``    : lead/lag label construction, rolling frames (W1-W4)
- ``aggregates`` : grouped aggregates, quality scans, moments (A1-A7)
- ``joins``      : equi-joins and the join-or-fuse builder (J1-J3, Q4)
- ``indicators`` : native technical-indicator computation (SMA/EMA/RSI/...)
- ``dedup``      : exact + near-duplicate detection (MinHash, SimHash, ...)
- ``simsearch``  : cosine similarity / ANN over embedding columns
- ``text``       : language-ID, quality scoring, token counts, fingerprints
- ``multimodal`` : opaque-binary media columns with Pandas-UDF stages
"""
