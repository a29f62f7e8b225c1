# Authoritative drop-in API of the Trie facade, mirroring the contract
# the reference publishes in its native-module stub
# (/root/reference/src/fastqdedup/_trie.pyi:20-44).
from typing import Iterator, List, Tuple


class Trie:
    def __init__(self, alphabet: str = ...) -> None: ...

    def add_sequence(self, sequence: str) -> None: ...

    def contains_sequence(
        self,
        sequence: str,
        max_distance: int = ...,
        use_edit_distance: bool = ...,
    ) -> bool: ...

    def pop_cluster(
        self,
        max_distance: int,
        use_edit_distance: bool = ...,
    ) -> List[Tuple[int, str]]: ...

    def pop_all_clusters(
        self,
        max_distance: int,
        use_edit_distance: bool = ...,
    ) -> Iterator[List[Tuple[int, str]]]: ...

    def memory_size(self) -> int: ...

    def raw_stats(self) -> List[List[int]]: ...

    @property
    def alphabet(self) -> str: ...

    @property
    def number_of_sequences(self) -> int: ...
