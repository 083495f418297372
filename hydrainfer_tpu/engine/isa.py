"""Instruction set — the scheduling IR.

Behavioral parity with the reference ISA (reference: hydrainfer/engine/isa.py):
a request becomes a doubly-linked instruction list, typically

    ImageEmbed → EPMigrate → PullCache → Fill(prefill) → PDMigrate →
    PullCache → Fill(decode) → Fill(decode) → ... → (tail sentinel)

Fill unifies prefill and decode: a decode Fill is just a 1-token Fill whose
token id is filled in by its predecessor's `sample_dst` link at execution
time. `chunk_prefill` splits a Fill in place for chunked prefill and for
prefix-cache skips.
"""
from typing import List, Optional, Tuple


class Instruction:
    next: Optional["Instruction"] = None
    prev: Optional["Instruction"] = None

    def insert_next(self, inst: "Instruction") -> None:
        inst.next = self.next
        inst.prev = self
        if self.next is not None:
            self.next.prev = inst
        self.next = inst


class EmptyInstruction(Instruction):
    def __repr__(self):
        return "EM"


class Fill(Instruction):
    """One LM forward chunk of a request.

    token_ids:   tokens to feed (None for a decode Fill until its token
                 arrives via sample_dst)
    position_ids/cache_ids: absolute positions / virtual kv-cache slots
    sample:      whether this Fill's last token produces a next token
    sample_dst:  the decode Fill that receives the sampled token
    hashes:      per-block prefix hashes (prefill only)
    is_chunked:  True for the head part of a split Fill — its sampled token
                 is an artifact and must not be emitted
    """

    def __init__(self, token_ids: Optional[List[int]], position_ids: List[int],
                 cache_ids: List[int], sample: bool,
                 sample_dst: Optional["Fill"], hashes: Optional[List[int]]):
        self.token_ids = token_ids
        self.position_ids = position_ids
        self.cache_ids = cache_ids
        self.sample = sample
        self.sample_dst = sample_dst
        self.hashes = hashes
        self.is_chunked = False
        # multimodal-RoPE h/w position streams ([h_list, w_list]); None =
        # all axes equal to position_ids (text tokens / non-mrope models)
        self.mrope_hw = None

    def n_tokens(self) -> int:
        return len(self.token_ids)

    def chunk_prefill(self, chunk_size: int) -> None:
        raise NotImplementedError


class TextFill(Fill):
    def chunk_prefill(self, chunk_size: int) -> None:
        assert 0 < chunk_size < len(self.token_ids), \
            f"invalid chunk size {chunk_size} for {len(self.token_ids)} tokens"
        rest = TextFill(
            token_ids=self.token_ids[chunk_size:],
            position_ids=self.position_ids[chunk_size:],
            cache_ids=self.cache_ids[chunk_size:],
            sample=self.sample,
            sample_dst=self.sample_dst,
            hashes=self.hashes,
        )
        self.insert_next(rest)
        if self.mrope_hw is not None:
            rest.mrope_hw = [a[chunk_size:] for a in self.mrope_hw]
            self.mrope_hw = [a[:chunk_size] for a in self.mrope_hw]
        self.token_ids = self.token_ids[:chunk_size]
        self.position_ids = self.position_ids[:chunk_size]
        self.cache_ids = self.cache_ids[:chunk_size]
        self.sample_dst = None
        self.is_chunked = True

    def __repr__(self):
        return "TF"


class ImageEmbedFill(Fill):
    """Prefill whose token stream contains image-token runs whose embeddings
    are overwritten by cached vision features.

    image_token_cache_ids: virtual image-cache slots feeding this chunk
    image_token_mask:      per-token flag, True at image positions
    """

    def __init__(self, image_token_cache_ids: List[int],
                 image_token_mask: List[bool], token_ids: Optional[List[int]],
                 position_ids: List[int], cache_ids: List[int], sample: bool,
                 sample_dst: Optional[Fill], hashes: Optional[List[int]]):
        super().__init__(token_ids, position_ids, cache_ids, sample,
                         sample_dst, hashes)
        self.image_token_cache_ids = image_token_cache_ids
        self.image_token_mask = image_token_mask

    def chunk_prefill(self, chunk_size: int) -> None:
        assert 0 < chunk_size < len(self.token_ids), \
            f"invalid chunk size {chunk_size} for {len(self.token_ids)} tokens"
        n_img_in_chunk = sum(self.image_token_mask[:chunk_size])
        rest = ImageEmbedFill(
            image_token_cache_ids=self.image_token_cache_ids[n_img_in_chunk:],
            image_token_mask=self.image_token_mask[chunk_size:],
            token_ids=self.token_ids[chunk_size:],
            position_ids=self.position_ids[chunk_size:],
            cache_ids=self.cache_ids[chunk_size:],
            sample=self.sample,
            sample_dst=self.sample_dst,
            hashes=self.hashes,
        )
        self.insert_next(rest)
        if self.mrope_hw is not None:
            rest.mrope_hw = [a[chunk_size:] for a in self.mrope_hw]
            self.mrope_hw = [a[:chunk_size] for a in self.mrope_hw]
        self.image_token_cache_ids = self.image_token_cache_ids[:n_img_in_chunk]
        self.image_token_mask = self.image_token_mask[:chunk_size]
        self.token_ids = self.token_ids[:chunk_size]
        self.position_ids = self.position_ids[:chunk_size]
        self.cache_ids = self.cache_ids[:chunk_size]
        self.sample_dst = None
        self.is_chunked = True

    def __repr__(self):
        return "EF"


class ImageEmbed(Instruction):
    """Run the vision tower and write projected features into the image cache."""

    def __init__(self, pixel_values, cache_ids: List[int],
                 images_size: List[Tuple[int, int]],
                 hashes: Optional[List[int]]):
        self.pixel_values = pixel_values     # np/jnp array
        self.cache_ids = cache_ids
        self.images_size = images_size
        self.hashes = hashes

    def __repr__(self):
        return "IE"


class MigrateRequest(Instruction):
    def __repr__(self):
        return "MR"


class EPMigrate(MigrateRequest):
    def __repr__(self):
        return "EPMR"


class PDMigrate(MigrateRequest):
    def __repr__(self):
        return "PDMR"


class PullCache(Instruction):
    """Receiver-side marker: pull the sender's cache blocks, set at migration
    time with the source node handle + source virtual caches."""

    def __init__(self):
        self.src_node: Optional[str] = None
        self.src_virtual_kv_cache = None
        self.src_virtual_image_cache = None

    def __repr__(self):
        return "PR"


class InstructionList:
    """Doubly-linked list with sentinel head/tail and a cursor."""

    def __init__(self, head: Instruction, tail: Instruction, curr: Instruction):
        self.head = head
        self.tail = tail
        self.curr = curr

    def __iter__(self):
        node = self.head
        while node is not None:
            yield node
            node = node.next

    def __repr__(self):
        parts = []
        for node in self:
            parts.append(("*" if node is self.curr else "") + repr(node))
        return "->".join(parts)


class InstructionListBuilder:
    def __init__(self):
        self.head = EmptyInstruction()
        self.tail = EmptyInstruction()
        self.head.next = self.tail
        self.tail.prev = self.head

    def append(self, inst: Instruction) -> None:
        self.tail.prev.insert_next(inst)

    def build(self) -> InstructionList:
        return InstructionList(self.head, self.tail, self.head.next)
