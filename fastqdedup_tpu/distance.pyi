# Authoritative drop-in API of the distance predicates, mirroring the
# reference's native-module stub
# (/root/reference/src/fastqdedup/_distance.pyi:17-21).

def hamming_distance(string1: str, string2: str) -> int: ...

def within_distance(
    string1: str,
    string2: str,
    max_distance: int,
    use_edit_distance: bool = ...,
) -> bool: ...
