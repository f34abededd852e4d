// Shared-memory SPSC ring buffer — the native transport for host worker
// fleets.  Counterpart of the reference's shared-memory TensorDict transport
// between batched-env / collector workers (torchrl uses tensors backed by
// mp shared memory + pipes for control; see SURVEY §3.3/§5.8).  Fixed-size
// slots carry raw array bytes; producer and consumer are lock-free
// (single-producer single-consumer, acquire/release atomics).
//
// C ABI (ctypes — no pybind11 in this image):
//   ring_create(name, slot_size, n_slots) -> handle (owner; unlinks on close)
//   ring_attach(name)                     -> handle
//   ring_push(h, buf, len)  -> 0, or -1 if full,  or -2 if len > slot_size
//   ring_pop(h, buf, cap)   -> payload len, or -1 if empty, -2 if cap small
//   ring_size(h)            -> number of filled slots
//   ring_slot_size(h)       -> payload bytes per slot
//   ring_close(h, unlink)
//
// Seqlock "latest-value" box (the reference _shared.py versioned-slot
// design, weight_update/_shared.py:327): one writer overwrites a single
// slot; any number of readers copy-and-verify.  Never blocks the writer —
// the right primitive for weight broadcast (an SPSC queue is not: a slow
// reader would stall the learner, and producer-side draining would make two
// consumers race on the tail).
//   box_create(name, size)            -> handle
//   box_attach(name)                  -> handle
//   box_write(h, buf, len)            -> 0, or -2 if len > size
//   box_read(h, buf, cap, *version)   -> payload len (0 if never written),
//                                        -2 if cap small, -3 if the writer
//                                        died mid-write (seq stuck odd);
//                                        *version out
//   box_close(h, unlink)
#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <unistd.h>

namespace {

struct Header {
  uint64_t magic;
  uint64_t slot_size;   // payload bytes per slot (excl. length word)
  uint64_t n_slots;
  alignas(64) std::atomic<uint64_t> head;  // next write index (producer)
  alignas(64) std::atomic<uint64_t> tail;  // next read index (consumer)
};

constexpr uint64_t kMagic = 0x524C54505552494E;  // "RLTPURIN"

struct Ring {
  Header* hdr;
  uint8_t* slots;   // n_slots * (8 + slot_size): [len u64][payload]
  size_t map_len;
  int fd;
  char name[256];
  bool owner;
};

inline uint8_t* slot_ptr(Ring* r, uint64_t idx) {
  const uint64_t stride = 8 + r->hdr->slot_size;
  return r->slots + (idx % r->hdr->n_slots) * stride;
}

Ring* map_ring(const char* name, int fd, size_t len, bool owner) {
  void* mem = mmap(nullptr, len, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) return nullptr;
  Ring* r = new Ring();
  r->hdr = static_cast<Header*>(mem);
  r->slots = static_cast<uint8_t*>(mem) + sizeof(Header);
  r->map_len = len;
  r->fd = fd;
  r->owner = owner;
  std::strncpy(r->name, name, sizeof(r->name) - 1);
  return r;
}

}  // namespace

extern "C" {

void* ring_create(const char* name, uint64_t slot_size, uint64_t n_slots) {
  shm_unlink(name);  // stale ring from a crashed run
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  size_t len = sizeof(Header) + n_slots * (8 + slot_size);
  if (ftruncate(fd, len) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  Ring* r = map_ring(name, fd, len, /*owner=*/true);
  if (!r) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  r->hdr->slot_size = slot_size;
  r->hdr->n_slots = n_slots;
  r->hdr->head.store(0, std::memory_order_relaxed);
  r->hdr->tail.store(0, std::memory_order_relaxed);
  r->hdr->magic = kMagic;  // published last
  return r;
}

void* ring_attach(const char* name) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  // read header first to size the mapping
  Header tmp;
  if (pread(fd, &tmp, sizeof(tmp), 0) != sizeof(tmp) || tmp.magic != kMagic) {
    close(fd);
    return nullptr;
  }
  size_t len = sizeof(Header) + tmp.n_slots * (8 + tmp.slot_size);
  return map_ring(name, fd, len, /*owner=*/false);
}

int ring_push(void* h, const uint8_t* buf, uint64_t len) {
  Ring* r = static_cast<Ring*>(h);
  if (len > r->hdr->slot_size) return -2;
  uint64_t head = r->hdr->head.load(std::memory_order_relaxed);
  uint64_t tail = r->hdr->tail.load(std::memory_order_acquire);
  if (head - tail >= r->hdr->n_slots) return -1;  // full
  uint8_t* slot = slot_ptr(r, head);
  std::memcpy(slot, &len, 8);
  std::memcpy(slot + 8, buf, len);
  r->hdr->head.store(head + 1, std::memory_order_release);
  return 0;
}

int64_t ring_pop(void* h, uint8_t* buf, uint64_t cap) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t tail = r->hdr->tail.load(std::memory_order_relaxed);
  uint64_t head = r->hdr->head.load(std::memory_order_acquire);
  if (tail == head) return -1;  // empty
  uint8_t* slot = slot_ptr(r, tail);
  uint64_t len;
  std::memcpy(&len, slot, 8);
  if (len > cap) return -2;
  std::memcpy(buf, slot + 8, len);
  r->hdr->tail.store(tail + 1, std::memory_order_release);
  return static_cast<int64_t>(len);
}

uint64_t ring_size(void* h) {
  Ring* r = static_cast<Ring*>(h);
  return r->hdr->head.load(std::memory_order_acquire) -
         r->hdr->tail.load(std::memory_order_acquire);
}

uint64_t ring_slot_size(void* h) {
  return static_cast<Ring*>(h)->hdr->slot_size;
}

void ring_close(void* h, int unlink) {
  Ring* r = static_cast<Ring*>(h);
  char name[256];
  std::strncpy(name, r->name, sizeof(name));
  munmap(r->hdr, r->map_len);
  close(r->fd);
  if (unlink) shm_unlink(name);
  delete r;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Seqlock latest-value box
// ---------------------------------------------------------------------------
namespace {

struct BoxHeader {
  uint64_t magic;
  uint64_t size;                           // payload capacity
  alignas(64) std::atomic<uint64_t> seq;   // even = stable, odd = writing
  alignas(64) std::atomic<uint64_t> len;   // current payload length
};

constexpr uint64_t kBoxMagic = 0x524C545055424F58;  // "RLTPUBOX"

struct Box {
  BoxHeader* hdr;
  uint8_t* data;
  size_t map_len;
  int fd;
  char name[256];
  bool owner;
};

Box* map_box(const char* name, int fd, size_t len, bool owner) {
  void* mem = mmap(nullptr, len, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) return nullptr;
  Box* b = new Box();
  b->hdr = static_cast<BoxHeader*>(mem);
  b->data = static_cast<uint8_t*>(mem) + sizeof(BoxHeader);
  b->map_len = len;
  b->fd = fd;
  b->owner = owner;
  std::strncpy(b->name, name, sizeof(b->name) - 1);
  return b;
}

}  // namespace

extern "C" {

void* box_create(const char* name, uint64_t size) {
  shm_unlink(name);
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return nullptr;
  size_t len = sizeof(BoxHeader) + size;
  if (ftruncate(fd, len) != 0) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  Box* b = map_box(name, fd, len, /*owner=*/true);
  if (!b) {
    close(fd);
    shm_unlink(name);
    return nullptr;
  }
  b->hdr->size = size;
  b->hdr->seq.store(0, std::memory_order_relaxed);
  b->hdr->len.store(0, std::memory_order_relaxed);
  b->hdr->magic = kBoxMagic;  // published last
  return b;
}

void* box_attach(const char* name) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  BoxHeader tmp;
  if (pread(fd, &tmp, sizeof(tmp), 0) != sizeof(tmp) ||
      tmp.magic != kBoxMagic) {
    close(fd);
    return nullptr;
  }
  return map_box(name, fd, sizeof(BoxHeader) + tmp.size, /*owner=*/false);
}

int box_write(void* h, const uint8_t* buf, uint64_t len) {
  Box* b = static_cast<Box*>(h);
  if (len > b->hdr->size) return -2;
  uint64_t s = b->hdr->seq.load(std::memory_order_relaxed);
  b->hdr->seq.store(s + 1, std::memory_order_release);   // odd: writing
  std::atomic_thread_fence(std::memory_order_release);
  std::memcpy(b->data, buf, len);
  b->hdr->len.store(len, std::memory_order_relaxed);
  b->hdr->seq.store(s + 2, std::memory_order_release);   // even: stable
  return 0;
}

int64_t box_read(void* h, uint8_t* buf, uint64_t cap, uint64_t* version) {
  // Bounded: a writer killed mid box_write leaves seq odd forever; after
  // ~2^26 spins (hundreds of ms — a live writer holds the odd state only
  // for one memcpy) give up with -3 rather than hang the reader.
  Box* b = static_cast<Box*>(h);
  for (uint64_t spin = 0;; ++spin) {
    uint64_t s1 = b->hdr->seq.load(std::memory_order_acquire);
    if (s1 & 1) {                              // writer mid-flight
      if (spin > (1ull << 26)) return -3;
      continue;
    }
    if (s1 == 0) { if (version) *version = 0; return 0; }
    uint64_t len = b->hdr->len.load(std::memory_order_relaxed);
    if (len > cap) return -2;
    std::memcpy(buf, b->data, len);
    std::atomic_thread_fence(std::memory_order_acquire);
    uint64_t s2 = b->hdr->seq.load(std::memory_order_acquire);
    if (s1 == s2) {
      if (version) *version = s1 >> 1;         // write count
      return static_cast<int64_t>(len);
    }
  }
}

uint64_t box_size(void* h) { return static_cast<Box*>(h)->hdr->size; }

void box_close(void* h, int unlink) {
  Box* b = static_cast<Box*>(h);
  char name[256];
  std::strncpy(name, b->name, sizeof(name));
  munmap(b->hdr, b->map_len);
  close(b->fd);
  if (unlink) shm_unlink(name);
  delete b;
}

}  // extern "C"
