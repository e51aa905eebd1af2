// Native chunk-store reader + background prefetcher for weathermodel_tpu.
//
// The reference's pretraining loader deserializes .pt chunks through
// torch's native (C++) unpickler (reference pretraining_dataloader.py:
// 203-205, torch.load). This is the TPU repo's native equivalent for its
// .npz chunk store: a zero-dependency ZIP(stored)+NPY parser plus a
// thread-pool prefetcher, exposed through a C ABI consumed via ctypes
// (weathermodel_tpu/data/native_io.py). Decoding and file IO run outside
// the Python GIL; the prefetcher overlaps next-chunk reads with the
// training step.
//
// Scope (matches what np.savez emits): ZIP entries with method 0
// (stored), little-endian NPY v1/v2 headers, C-contiguous arrays.
// Anything else returns an error and the Python side falls back to
// numpy's loader.
//
// Build: g++ -O3 -shared -fPIC -o libwmchunkio.so chunkio.cc -lpthread

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <set>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Entry {
  std::string name;
  uint64_t data_offset;  // absolute offset of the entry payload
  uint64_t size;         // stored == uncompressed size
};

struct Npy {
  std::string dtype;           // e.g. "<f4"
  std::vector<uint64_t> shape; // C order
  uint64_t data_offset;        // absolute offset of raw array data
  uint64_t nbytes;
};

struct Archive {
  std::string path;
  std::vector<char> buf;       // whole file
  std::map<std::string, Npy> arrays;
  bool ok = false;
  std::string error;
};

uint16_t rd16(const char* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}
uint32_t rd32(const char* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

bool read_file(const std::string& path, std::vector<char>* out,
               std::string* err) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    *err = "open failed: " + path;
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(n);
  size_t got = n ? std::fread(out->data(), 1, n, f) : 0;
  std::fclose(f);
  if ((long)got != n) {
    *err = "short read: " + path;
    return false;
  }
  return true;
}

// Minimal ZIP central-directory walk (no zip64: np.savez only switches to
// zip64 past 4GB/entry, far beyond chunk sizes).
bool parse_zip(const std::vector<char>& b, std::vector<Entry>* entries,
               std::string* err) {
  if (b.size() < 22) {
    *err = "not a zip";
    return false;
  }
  // find End Of Central Directory (scan back over possible comment)
  size_t eocd = std::string::npos;
  size_t lo = b.size() >= 22 + 65535 ? b.size() - 22 - 65535 : 0;
  for (size_t i = b.size() - 22 + 1; i-- > lo;) {
    if (rd32(&b[i]) == 0x06054b50) {
      eocd = i;
      break;
    }
  }
  if (eocd == std::string::npos) {
    *err = "no EOCD";
    return false;
  }
  uint16_t n_entries = rd16(&b[eocd + 10]);
  uint32_t cd_off = rd32(&b[eocd + 16]);
  size_t p = cd_off;
  for (uint16_t k = 0; k < n_entries; ++k) {
    if (p + 46 > b.size() || rd32(&b[p]) != 0x02014b50) {
      *err = "bad central directory";
      return false;
    }
    uint16_t method = rd16(&b[p + 10]);
    uint32_t csize = rd32(&b[p + 20]);
    uint32_t usize = rd32(&b[p + 24]);
    uint16_t nlen = rd16(&b[p + 28]);
    uint16_t xlen = rd16(&b[p + 30]);
    uint16_t clen = rd16(&b[p + 32]);
    uint32_t lho = rd32(&b[p + 42]);
    if (p + 46 + (size_t)nlen > b.size()) {
      *err = "truncated central directory entry";
      return false;
    }
    std::string name(&b[p + 46], nlen);
    if (method != 0) {
      *err = "compressed entry (method != stored): " + name;
      return false;
    }
    if (csize != usize) {
      *err = "stored size mismatch: " + name;
      return false;
    }
    // local header: 30 bytes + name + extra (extra may differ from CD's)
    if ((uint64_t)lho + 30 > b.size() || rd32(&b[lho]) != 0x04034b50) {
      *err = "bad local header: " + name;
      return false;
    }
    uint16_t lnlen = rd16(&b[lho + 26]);
    uint16_t lxlen = rd16(&b[lho + 28]);
    Entry e;
    e.name = name;
    e.data_offset = (uint64_t)lho + 30 + lnlen + lxlen;
    e.size = usize;
    if (e.data_offset + e.size > b.size()) {
      *err = "entry overruns file: " + name;
      return false;
    }
    entries->push_back(std::move(e));
    p += 46 + nlen + xlen + clen;
  }
  return true;
}

// NPY v1/v2 header parse; returns false on anything exotic.
bool parse_npy(const std::vector<char>& b, const Entry& e, Npy* out,
               std::string* err) {
  const char* p = &b[e.data_offset];
  if (e.size < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) {
    *err = "bad npy magic: " + e.name;
    return false;
  }
  uint8_t major = p[6];
  uint64_t hlen, hoff;
  if (major == 1) {
    hlen = rd16(p + 8);
    hoff = 10;
  } else {
    if (e.size < 12) {
      *err = "truncated npy v2 header: " + e.name;
      return false;
    }
    hlen = rd32(p + 8);
    hoff = 12;
  }
  if (hoff + hlen > e.size) {
    *err = "npy header overruns entry: " + e.name;
    return false;
  }
  std::string hdr(p + hoff, hlen);
  // parse "'descr': '<f4'", "'fortran_order': False", "'shape': (a, b,)"
  auto find_val = [&](const std::string& key) -> std::string {
    size_t k = hdr.find("'" + key + "'");
    if (k == std::string::npos) return "";
    k = hdr.find(':', k);
    return k == std::string::npos ? "" : hdr.substr(k + 1);
  };
  std::string d = find_val("descr");
  size_t q1 = d.find('\'');
  size_t q2 = d.find('\'', q1 + 1);
  if (q1 == std::string::npos || q2 == std::string::npos) {
    *err = "bad descr: " + e.name;
    return false;
  }
  out->dtype = d.substr(q1 + 1, q2 - q1 - 1);
  std::string fo = find_val("fortran_order");
  if (fo.find("False") == std::string::npos) {
    *err = "fortran order unsupported: " + e.name;
    return false;
  }
  std::string sh = find_val("shape");
  size_t l = sh.find('(');
  size_t r = sh.find(')');
  if (l == std::string::npos || r == std::string::npos) {
    *err = "bad shape: " + e.name;
    return false;
  }
  out->shape.clear();
  uint64_t cur = 0;
  bool have = false;
  for (size_t i = l + 1; i < r; ++i) {
    char c = sh[i];
    if (c >= '0' && c <= '9') {
      cur = cur * 10 + (c - '0');
      have = true;
    } else if (c == ',') {
      if (have) out->shape.push_back(cur);
      cur = 0;
      have = false;
    }
  }
  if (have) out->shape.push_back(cur);
  uint64_t elems = 1;
  for (uint64_t s : out->shape) elems *= s;
  uint64_t itemsize = 0;
  // descr like '<f4' / '<f8' / '<i4' — trailing digits are the itemsize
  for (char c : out->dtype)
    if (c >= '0' && c <= '9') itemsize = itemsize * 10 + (c - '0');
  if (itemsize == 0) {
    *err = "bad itemsize: " + e.name;
    return false;
  }
  out->nbytes = elems * itemsize;
  out->data_offset = e.data_offset + hoff + hlen;
  // strict: the declared array must fit entirely inside the ZIP entry
  // (np.save pads the header, never the payload) — a short entry must
  // error out to the numpy fallback, not read trailing archive bytes
  if (out->data_offset + out->nbytes > e.data_offset + e.size) {
    *err = "npy payload overrun: " + e.name;
    return false;
  }
  return true;
}

std::shared_ptr<Archive> load_archive(const std::string& path) {
  auto a = std::make_shared<Archive>();
  a->path = path;
  if (!read_file(path, &a->buf, &a->error)) return a;
  std::vector<Entry> entries;
  if (!parse_zip(a->buf, &entries, &a->error)) return a;
  for (const Entry& e : entries) {
    Npy n;
    if (!parse_npy(a->buf, e, &n, &a->error)) return a;
    std::string key = e.name;
    if (key.size() > 4 && key.compare(key.size() - 4, 4, ".npy") == 0)
      key = key.substr(0, key.size() - 4);
    a->arrays[key] = std::move(n);
  }
  a->ok = true;
  return a;
}

// ---- prefetcher ----------------------------------------------------------

class Prefetcher {
 public:
  explicit Prefetcher(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { worker(); });
  }
  ~Prefetcher() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void enqueue(const std::string& path) {
    std::lock_guard<std::mutex> g(mu_);
    if (cache_.count(path) || pending_.count(path)) return;
    pending_.insert(path);
    queue_.push_back(path);
    cv_.notify_one();
  }

  // blocks until `path` is loaded (loads synchronously if never enqueued;
  // re-loads if a concurrent evict won the race after a worker finished)
  std::shared_ptr<Archive> get(const std::string& path) {
    std::unique_lock<std::mutex> lk(mu_);
    for (;;) {
      auto it = cache_.find(path);
      if (it != cache_.end()) return it->second;
      if (!pending_.count(path)) {
        lk.unlock();
        auto a = load_archive(path);
        lk.lock();
        cache_[path] = a;
        done_cv_.notify_all();
        return a;
      }
      done_cv_.wait(lk);
    }
  }

  void evict(const std::string& path) {
    std::lock_guard<std::mutex> g(mu_);
    cache_.erase(path);
  }

 private:
  void worker() {
    for (;;) {
      std::string path;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return stop_ || !queue_.empty(); });
        if (stop_) return;
        path = queue_.front();
        queue_.pop_front();
      }
      auto a = load_archive(path);
      {
        std::lock_guard<std::mutex> g(mu_);
        cache_[path] = a;
        pending_.erase(path);
      }
      done_cv_.notify_all();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::deque<std::string> queue_;
  std::map<std::string, std::shared_ptr<Archive>> cache_;
  std::set<std::string> pending_;
  std::vector<std::thread> workers_;
  bool stop_;
};

std::mutex g_mu;
// handle table with open-refcounts: concurrent readers of the same path
// each wm_open/wm_close; the archive is dropped at refcount zero only.
std::map<std::string, std::pair<std::shared_ptr<Archive>, int>> g_open;
Prefetcher* g_prefetcher = nullptr;

Prefetcher* prefetcher() {
  std::lock_guard<std::mutex> g(g_mu);
  if (!g_prefetcher) g_prefetcher = new Prefetcher(2);
  return g_prefetcher;
}

thread_local std::string g_last_error;

}  // namespace

extern "C" {

// Opens (or fetches from the prefetch cache) an archive; returns 0 on
// success. The archive stays resident until wm_close.
int wm_open(const char* path) {
  auto a = prefetcher()->get(path);
  if (!a->ok) {
    // do NOT negative-cache failures: drop the (possibly multi-MB) buffer
    // and let a later open retry — the file may be mid-write or the
    // caller will fall back to numpy (compressed archives)
    prefetcher()->evict(path);
    g_last_error = a->error;
    return 1;
  }
  std::lock_guard<std::mutex> g(g_mu);
  auto& slot = g_open[path];
  slot.first = a;
  slot.second += 1;
  return 0;
}

// Number of arrays in an opened archive (-1 if not open).
int wm_num_arrays(const char* path) {
  std::lock_guard<std::mutex> g(g_mu);
  auto it = g_open.find(path);
  if (it == g_open.end()) return -1;
  return (int)it->second.first->arrays.size();
}

// Query an array: writes dtype (<=15 chars), ndim, shape (<=8 dims),
// nbytes. Returns 0 on success.
int wm_array_info(const char* path, const char* name, char* dtype_out,
                  int* ndim_out, int64_t* shape_out, int64_t* nbytes_out) {
  std::lock_guard<std::mutex> g(g_mu);
  auto it = g_open.find(path);
  if (it == g_open.end()) {
    g_last_error = "archive not open";
    return 1;
  }
  auto jt = it->second.first->arrays.find(name);
  if (jt == it->second.first->arrays.end()) {
    g_last_error = std::string("no such array: ") + name;
    return 1;
  }
  const Npy& n = jt->second;
  std::snprintf(dtype_out, 16, "%s", n.dtype.c_str());
  *ndim_out = (int)n.shape.size();
  for (size_t i = 0; i < n.shape.size() && i < 8; ++i)
    shape_out[i] = (int64_t)n.shape[i];
  *nbytes_out = (int64_t)n.nbytes;
  return 0;
}

// Copy array payload into caller buffer (must be nbytes long).
int wm_array_read(const char* path, const char* name, void* out) {
  std::shared_ptr<Archive> a;
  {
    std::lock_guard<std::mutex> g(g_mu);
    auto it = g_open.find(path);
    if (it == g_open.end()) {
      g_last_error = "archive not open";
      return 1;
    }
    a = it->second.first;
  }
  auto jt = a->arrays.find(name);
  if (jt == a->arrays.end()) {
    g_last_error = std::string("no such array: ") + name;
    return 1;
  }
  std::memcpy(out, a->buf.data() + jt->second.data_offset,
              jt->second.nbytes);
  return 0;
}

// Close one open-reference; drop + evict at refcount zero.
void wm_close(const char* path) {
  bool drop = false;
  {
    std::lock_guard<std::mutex> g(g_mu);
    auto it = g_open.find(path);
    if (it == g_open.end()) return;
    if (--it->second.second <= 0) {
      g_open.erase(it);
      drop = true;
    }
  }
  if (drop) prefetcher()->evict(path);
}

// Hint: start loading `path` on a background thread.
void wm_prefetch(const char* path) { prefetcher()->enqueue(path); }

const char* wm_last_error() { return g_last_error.c_str(); }

}  // extern "C"
