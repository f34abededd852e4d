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
//   ring_close(h, unlink)
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
