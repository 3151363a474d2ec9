// notorch-tpu native featurizer: SMILES -> type-index graph arrays.
//
// The data-loader hot path in C++ (the role RDKit/C++ plays in the
// reference's stack): parse SMILES, perceive rings/aromaticity/implicit
// hydrogens/hybridization/cis-trans, and emit the exact type-index
// featurization of notorch_tpu.transforms (42 atom / 13 bond type ids,
// family-offset scheme) plus the interleaved directed edge list.
//
// Exposed as a C ABI consumed via ctypes; bit-exact parity with the Python
// path is enforced by tests/test_native.py over the full fixture sets.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libfeaturizer.so featurizer.cpp -lpthread

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---- chemistry model -------------------------------------------------------

enum Hyb { H_S = 0, H_SP, H_SP2, H_SP3, H_SP3D, H_SP3D2, H_UNSPEC };
enum Chir { C_UNSPEC = 0, C_CW, C_CCW, C_OTHER };
enum BondOrder { B_SINGLE = 0, B_DOUBLE, B_TRIPLE, B_AROMATIC };
enum Stereo { S_NONE = 0, S_ANY, S_Z, S_E, S_CIS, S_TRANS, S_ATROPCW };

struct Atom {
  std::string symbol;
  bool aromatic = false;
  int formal_charge = 0;
  int explicit_hs = -1;  // -1 => derive implicit
  int isotope = 0;
  int atom_map = 0;
  Chir chiral = C_UNSPEC;
  // derived
  int num_implicit_hs = 0;
  Hyb hyb = H_UNSPEC;
};

struct Bond {
  int begin = 0, end = 0;
  BondOrder order = B_SINGLE;
  Stereo stereo = S_NONE;
  char direction = 0;  // '/', '\\', or 0
  bool in_ring = false;
};

struct Mol {
  std::vector<Atom> atoms;
  std::vector<Bond> bonds;
  std::vector<std::vector<int>> adj;  // atom -> bond indices

  int add_atom(Atom a) {
    atoms.push_back(std::move(a));
    adj.emplace_back();
    return (int)atoms.size() - 1;
  }
  int add_bond(Bond b) {
    int idx = (int)bonds.size();
    adj[b.begin].push_back(idx);
    adj[b.end].push_back(idx);
    bonds.push_back(b);
    return idx;
  }
  int other(int bond_idx, int atom_idx) const {
    const Bond& b = bonds[bond_idx];
    return b.begin == atom_idx ? b.end : b.begin;
  }
};

// default valences (lowest first)
static bool default_valences(const std::string& s, std::vector<int>& out) {
  if (s == "H" || s == "F" || s == "Cl" || s == "Br" || s == "I") out = {1};
  else if (s == "B") out = {3};
  else if (s == "C") out = {4};
  else if (s == "N") out = {3};
  else if (s == "O") out = {2};
  else if (s == "P") out = {3, 5};
  else if (s == "S") out = {2, 4, 6};
  else return false;
  return true;
}

static bool organic_subset(const std::string& s) {
  return s == "B" || s == "C" || s == "N" || s == "O" || s == "P" || s == "S" ||
         s == "F" || s == "Cl" || s == "Br" || s == "I";
}

// ---- SMILES parser ---------------------------------------------------------

struct Parser {
  std::string buf;  // owned: p/end must not dangle
  const char* p;
  const char* end;
  Mol mol;
  bool ok = true;

  explicit Parser(std::string s)
      : buf(std::move(s)), p(buf.c_str()), end(buf.c_str() + buf.size()) {}

  bool fail() {
    ok = false;
    return false;
  }

  bool parse() {
    int prev = -1;
    int pending_bond = -1;  // -1 = default
    char pending_dir = 0;
    std::vector<int> branch;
    struct RingOpen { int atom; int bond; char dir; bool open = false; };
    RingOpen rings[100] = {};

    while (p < end && ok) {
      char ch = *p;
      if (ch == '[') {
        const char* close = strchr(p, ']');
        if (!close) return fail();
        Atom a;
        if (!parse_bracket(std::string(p + 1, close), a)) return fail();
        p = close + 1;
        prev = attach(a, prev, pending_bond, pending_dir);
        pending_bond = -1; pending_dir = 0;
      } else if (isalpha((unsigned char)ch) || ch == '*') {
        std::string sym;
        if ((ch == 'C' && p + 1 < end && p[1] == 'l') ||
            (ch == 'B' && p + 1 < end && p[1] == 'r')) {
          sym = std::string(p, p + 2);
          p += 2;
        } else {
          sym = std::string(1, ch);
          p += 1;
        }
        bool arom = islower((unsigned char)sym[0]);
        if (arom) sym[0] = (char)toupper((unsigned char)sym[0]);
        if (sym != "*" && !organic_subset(sym)) return fail();
        Atom a;
        a.symbol = sym;
        a.aromatic = arom;
        prev = attach(a, prev, pending_bond, pending_dir);
        pending_bond = -1; pending_dir = 0;
      } else if (ch == '-' || ch == '=' || ch == '#' || ch == ':' || ch == '/' || ch == '\\') {
        pending_bond = (ch == '=') ? B_DOUBLE : (ch == '#') ? B_TRIPLE
                        : (ch == ':') ? B_AROMATIC : B_SINGLE;
        pending_dir = (ch == '/' || ch == '\\') ? ch : 0;
        ++p;
      } else if (isdigit((unsigned char)ch) || ch == '%') {
        int num;
        if (ch == '%') {
          if (p + 2 >= end || !isdigit((unsigned char)p[1]) ||
              !isdigit((unsigned char)p[2]))
            return fail();
          num = (p[1] - '0') * 10 + (p[2] - '0');
          p += 3;
        } else {
          num = ch - '0';
          ++p;
        }
        if (num < 0 || num >= 100) return fail();
        if (prev < 0) return fail();
        if (rings[num].open) {
          int other = rings[num].atom;
          int bt = pending_bond >= 0 ? pending_bond
                   : rings[num].bond >= 0 ? rings[num].bond
                   : default_bond(other, prev);
          Bond b;
          b.begin = other;
          b.end = prev;
          b.order = (BondOrder)bt;
          b.direction = pending_dir ? pending_dir : rings[num].dir;
          mol.add_bond(b);
          rings[num].open = false;
        } else {
          rings[num] = {prev, pending_bond, pending_dir, true};
        }
        pending_bond = -1; pending_dir = 0;
      } else if (ch == '(') {
        branch.push_back(prev);
        ++p;
      } else if (ch == ')') {
        if (branch.empty()) return fail();
        prev = branch.back();
        branch.pop_back();
        ++p;
      } else if (ch == '.') {
        prev = -1;
        pending_bond = -1; pending_dir = 0;
        ++p;
      } else if (isspace((unsigned char)ch)) {
        break;
      } else {
        return fail();
      }
    }
    if (!ok) return false;
    for (auto& r : rings)
      if (r.open) return fail();
    if (!branch.empty()) return fail();
    if (pending_bond >= 0 || pending_dir) return fail();  // dangling bond
    return true;
  }

  int default_bond(int a, int b) {
    return (mol.atoms[a].aromatic && mol.atoms[b].aromatic) ? B_AROMATIC : B_SINGLE;
  }

  int attach(Atom a, int prev, int pending_bond, char pending_dir) {
    int idx = mol.add_atom(std::move(a));
    if (prev >= 0) {
      Bond b;
      b.begin = prev;
      b.end = idx;
      b.order = (BondOrder)(pending_bond >= 0 ? pending_bond : default_bond(prev, idx));
      b.direction = pending_dir;
      mol.add_bond(b);
    }
    return idx;
  }

  bool parse_bracket(const std::string& body, Atom& a) {
    size_t i = 0, n = body.size();
    // isotope
    int iso = 0;
    while (i < n && isdigit((unsigned char)body[i])) iso = iso * 10 + (body[i++] - '0');
    a.isotope = iso;
    // symbol (or aromatic lowercase / *)
    if (i >= n) return false;
    if (body[i] == '*') {
      a.symbol = "*";
      ++i;
    } else if (isupper((unsigned char)body[i])) {
      a.symbol = std::string(1, body[i++]);
      if (i < n && islower((unsigned char)body[i]) && body[i] != 'h' &&
          !(body[i] == 's' && a.symbol == "A")) {
        // two-letter element (avoid eating H-count 'h'? H-count is 'H' uppercase)
        a.symbol += body[i++];
      }
    } else if (islower((unsigned char)body[i])) {
      // aromatic: c n o p s b; also se/as/te/si
      std::string sym(1, body[i++]);
      if ((sym == "s" || sym == "a" || sym == "t") && i < n &&
          (body[i] == 'e' || body[i] == 's' || body[i] == 'i')) {
        sym += body[i++];
      }
      a.aromatic = true;
      sym[0] = (char)toupper((unsigned char)sym[0]);
      a.symbol = sym;
    } else {
      return false;
    }
    // chirality
    if (i < n && body[i] == '@') {
      ++i;
      if (i < n && body[i] == '@') {
        a.chiral = C_CW;
        ++i;
      } else {
        a.chiral = C_CCW;
      }
      // named chirality classes (TH1, AL1, ...) -> OTHER
      if (i + 1 < n && isupper((unsigned char)body[i]) && isupper((unsigned char)body[i + 1])) {
        a.chiral = C_OTHER;
        i += 2;
        while (i < n && isdigit((unsigned char)body[i])) ++i;
      }
    }
    // H count
    a.explicit_hs = 0;
    if (i < n && body[i] == 'H') {
      ++i;
      int h = 0;
      bool any = false;
      while (i < n && isdigit((unsigned char)body[i])) {
        h = h * 10 + (body[i++] - '0');
        any = true;
      }
      a.explicit_hs = any ? h : 1;
    }
    // charge
    if (i < n && (body[i] == '+' || body[i] == '-')) {
      char sgn = body[i];
      int cnt = 0;
      while (i < n && body[i] == sgn) {
        ++cnt;
        ++i;
      }
      int mag = cnt;
      if (cnt == 1 && i < n && isdigit((unsigned char)body[i])) {
        mag = 0;
        while (i < n && isdigit((unsigned char)body[i])) mag = mag * 10 + (body[i++] - '0');
      }
      a.formal_charge = sgn == '+' ? mag : -mag;
    }
    // atom map
    if (i < n && body[i] == ':') {
      ++i;
      int m = 0;
      while (i < n && isdigit((unsigned char)body[i])) m = m * 10 + (body[i++] - '0');
      a.atom_map = m;
    }
    return i == n;
  }
};

// ---- perception ------------------------------------------------------------

static void find_ring_bonds(Mol& m) {
  // bridges via iterative Tarjan; ring bonds = non-bridges
  int n = (int)m.atoms.size();
  std::vector<int> disc(n, -1), low(n, 0);
  std::vector<bool> is_bridge(m.bonds.size(), false);
  int timer = 0;

  struct Frame { int u, pb; size_t ptr; };
  for (int root = 0; root < n; ++root) {
    if (disc[root] >= 0) continue;
    std::vector<Frame> stack{{root, -1, 0}};
    disc[root] = low[root] = timer++;
    while (!stack.empty()) {
      Frame& f = stack.back();
      bool advanced = false;
      while (f.ptr < m.adj[f.u].size()) {
        int b_idx = m.adj[f.u][f.ptr++];
        if (b_idx == f.pb) continue;
        int v = m.other(b_idx, f.u);
        if (disc[v] < 0) {
          disc[v] = low[v] = timer++;
          stack.push_back({v, b_idx, 0});
          advanced = true;
          break;
        } else {
          if (disc[v] < low[f.u]) low[f.u] = disc[v];
        }
      }
      if (!advanced && f.ptr >= m.adj[f.u].size()) {
        Frame done = stack.back();
        stack.pop_back();
        if (!stack.empty()) {
          Frame& parent = stack.back();
          if (low[done.u] < low[parent.u]) low[parent.u] = low[done.u];
          if (low[done.u] > disc[parent.u]) is_bridge[done.pb] = true;
        }
      }
    }
  }
  for (size_t i = 0; i < m.bonds.size(); ++i) {
    m.bonds[i].in_ring = !is_bridge[i];
    if (m.bonds[i].order == B_AROMATIC && !m.bonds[i].in_ring)
      m.bonds[i].order = B_SINGLE;
  }
}

static int bond_order_sum(const Mol& m, int atom_idx) {
  const Atom& a = m.atoms[atom_idx];
  if (a.aromatic) {
    int s = 0;
    for (int bi : m.adj[atom_idx]) {
      const Bond& b = m.bonds[bi];
      s += (b.order == B_AROMATIC) ? 1 : (b.order == B_DOUBLE ? 2 : b.order == B_TRIPLE ? 3 : 1);
    }
    if (a.symbol != "O" && a.symbol != "S" && a.symbol != "Se" && a.symbol != "Te") s += 1;
    return s;
  }
  double total = 0;
  for (int bi : m.adj[atom_idx]) {
    const Bond& b = m.bonds[bi];
    total += b.order == B_DOUBLE ? 2.0 : b.order == B_TRIPLE ? 3.0
             : b.order == B_AROMATIC ? 1.5 : 1.0;
  }
  double frac = total - (long)total;
  return frac > 0 ? (int)total + 1 : (int)total;
}

static void assign_implicit_hs(Mol& m) {
  for (size_t i = 0; i < m.atoms.size(); ++i) {
    Atom& a = m.atoms[i];
    if (a.explicit_hs >= 0) {
      a.num_implicit_hs = 0;
      continue;
    }
    std::vector<int> valences;
    if (!default_valences(a.symbol, valences)) {
      a.num_implicit_hs = 0;
      continue;
    }
    int bos = bond_order_sum(m, (int)i);
    int chg = a.formal_charge;
    int nh = 0;
    for (int v : valences) {
      int eff;
      if (a.symbol == "N" || a.symbol == "P" || a.symbol == "B") eff = v + chg;
      else eff = v - std::abs(chg);
      if ((a.symbol == "O" || a.symbol == "S") && chg > 0) eff = v + chg;
      if (eff >= bos) {
        nh = eff - bos;
        break;
      }
    }
    a.num_implicit_hs = nh > 0 ? nh : 0;
  }
}

static int total_hs(const Mol& m, int i) {
  const Atom& a = m.atoms[i];
  return (a.explicit_hs > 0 ? a.explicit_hs : 0) + a.num_implicit_hs;
}

static void assign_hybridization(Mol& m) {
  for (size_t i = 0; i < m.atoms.size(); ++i) {
    Atom& a = m.atoms[i];
    if (a.symbol == "H") {
      a.hyb = H_S;
      continue;
    }
    int n_triple = 0, n_double = 0;
    for (int bi : m.adj[i]) {
      if (m.bonds[bi].order == B_TRIPLE) ++n_triple;
      if (m.bonds[bi].order == B_DOUBLE) ++n_double;
    }
    if (n_triple || n_double >= 2) a.hyb = H_SP;
    else if (n_double || a.aromatic) a.hyb = H_SP2;
    else {
      int total = (int)m.adj[i].size() + total_hs(m, (int)i);
      a.hyb = total > 5 ? H_SP3D2 : total == 5 ? H_SP3D : H_SP3;
    }
  }
}

// directional neighbor normalized "as seen from atom_idx"
static bool directional_neighbor(const Mol& m, int atom_idx, int skip, char& dir_out) {
  for (int bi : m.adj[atom_idx]) {
    if (bi == skip) continue;
    const Bond& b = m.bonds[bi];
    if (!b.direction) continue;
    char d = b.direction;
    if (b.end == atom_idx) d = (d == '/') ? '\\' : '/';
    dir_out = d;
    return true;
  }
  return false;
}

static void perceive_stereo(Mol& m) {
  for (size_t i = 0; i < m.bonds.size(); ++i) {
    Bond& b = m.bonds[i];
    if (b.order != B_DOUBLE || b.in_ring) continue;
    char l, r;
    if (!directional_neighbor(m, b.begin, (int)i, l)) continue;
    if (!directional_neighbor(m, b.end, (int)i, r)) continue;
    b.stereo = (l == r) ? S_CIS : S_TRANS;
  }
}

// ---- featurization (type-index + family offsets, matches vocab.py) ---------

static int element_id(const std::string& s) {
  static const char* elems[] = {"H", "C", "N", "O", "F", "P", "S", "Cl", "Br", "I"};
  for (int i = 0; i < 10; ++i)
    if (s == elems[i]) return i;
  return 10;  // UNK
}

static int degree_id(int deg) { return (deg >= 0 && deg <= 3) ? deg : 4; }

static int charge_id(int c) {
  switch (c) {
    case -1: return 0;
    case -2: return 1;
    case 1: return 2;
    case 2: return 3;
    case 0: return 4;
    default: return 5;
  }
}

static int numhs_id(int h) { return (h >= 0 && h <= 4) ? h : 5; }

// family offsets: elements(11) hyb(7) chir(5) degree(5) charge(6) numhs(6) arom(2)
static const int A_OFF[7] = {0, 11, 18, 23, 28, 34, 40};
// bond offsets: type(5) stereo(8)
static const int B_OFF[2] = {0, 5};

static void featurize(const Mol& m, int32_t* node_types, int32_t* edge_types,
                      int32_t* src, int32_t* dst) {
  for (size_t i = 0; i < m.atoms.size(); ++i) {
    const Atom& a = m.atoms[i];
    int hyb = a.hyb == H_UNSPEC ? 6 : (int)a.hyb;  // UNK slot
    int chir = (int)a.chiral;                       // matches vocab order
    int deg = degree_id((int)m.adj[i].size() + total_hs(m, (int)i));
    int32_t* row = node_types + i * 7;
    row[0] = A_OFF[0] + element_id(a.symbol);
    row[1] = A_OFF[1] + (hyb > 6 ? 6 : hyb);
    row[2] = A_OFF[2] + chir;
    row[3] = A_OFF[3] + deg;
    row[4] = A_OFF[4] + charge_id(a.formal_charge);
    row[5] = A_OFF[5] + numhs_id(total_hs(m, (int)i));
    row[6] = A_OFF[6] + (a.aromatic ? 0 : 1);  // vocab [True, False]
  }
  for (size_t i = 0; i < m.bonds.size(); ++i) {
    const Bond& b = m.bonds[i];
    int32_t t = B_OFF[0] + (int)b.order;  // enum order matches vocab
    int32_t s = B_OFF[1] + (int)b.stereo;
    for (int k = 0; k < 2; ++k) {
      edge_types[(2 * i + k) * 2 + 0] = t;
      edge_types[(2 * i + k) * 2 + 1] = s;
    }
    src[2 * i] = b.begin;
    dst[2 * i] = b.end;
    src[2 * i + 1] = b.end;
    dst[2 * i + 1] = b.begin;
  }
}

static bool featurize_one(const char* smi, int32_t* node_types, int32_t* edge_types,
                          int32_t* src, int32_t* dst, int32_t* n_atoms, int32_t* n_edges,
                          int max_atoms, int max_edges) {
  Parser parser{std::string(smi)};
  if (!parser.parse()) return false;
  Mol& m = parser.mol;
  if ((int)m.atoms.size() > max_atoms || (int)(2 * m.bonds.size()) > max_edges) return false;
  find_ring_bonds(m);
  assign_implicit_hs(m);
  assign_hybridization(m);
  perceive_stereo(m);
  featurize(m, node_types, edge_types, src, dst);
  *n_atoms = (int32_t)m.atoms.size();
  *n_edges = (int32_t)(2 * m.bonds.size());
  return true;
}

}  // namespace

extern "C" {

// Single molecule. Returns 0 on success, nonzero on parse/overflow failure.
int ntpu_featurize(const char* smi, int32_t* node_types, int32_t* edge_types,
                   int32_t* src, int32_t* dst, int32_t* n_atoms, int32_t* n_edges,
                   int max_atoms, int max_edges) {
  return featurize_one(smi, node_types, edge_types, src, dst, n_atoms, n_edges,
                       max_atoms, max_edges)
             ? 0
             : 1;
}

// Batch: smis is a \n-joined buffer; per-molecule slabs of fixed stride.
// status[i] = 0 ok / 1 failed. Parallelized across n_threads.
int ntpu_featurize_batch(const char* smis_joined, int n_mols, int32_t* node_types,
                         int32_t* edge_types, int32_t* src, int32_t* dst,
                         int32_t* n_atoms, int32_t* n_edges, int32_t* status,
                         int max_atoms, int max_edges, int n_threads) {
  std::vector<const char*> starts;
  std::vector<std::string> smis;
  {
    const char* p = smis_joined;
    for (int i = 0; i < n_mols; ++i) {
      const char* nl = strchr(p, '\n');
      size_t len = nl ? (size_t)(nl - p) : strlen(p);
      smis.emplace_back(p, len);
      p = nl ? nl + 1 : p + len;
    }
  }
  auto work = [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      bool ok = featurize_one(
          smis[i].c_str(), node_types + (size_t)i * max_atoms * 7,
          edge_types + (size_t)i * max_edges * 2, src + (size_t)i * max_edges,
          dst + (size_t)i * max_edges, n_atoms + i, n_edges + i, max_atoms, max_edges);
      status[i] = ok ? 0 : 1;
    }
  };
  if (n_threads <= 1) {
    work(0, n_mols);
  } else {
    std::vector<std::thread> threads;
    int per = (n_mols + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int lo = t * per, hi = std::min(n_mols, lo + per);
      if (lo >= hi) break;
      threads.emplace_back(work, lo, hi);
    }
    for (auto& t : threads) t.join();
  }
  return 0;
}

}  // extern "C"
